"""Adversarial property tests for the exact-substring span family
(llm/dedup.duplicated_spans / remove_duplicated_spans) — VERDICT r12
item 7: the window-fingerprint approximation's edge cases (overlapping
repeats straddling window boundaries, repeats of length exactly ``w``,
within-document repeats) cross-checked against a brute-force
substring-scan model of the same semantics.

The model is the operator's CONTRACT, restated imperatively:
- every 1-based position ``i`` with ``i + w - 1 <= n`` fingerprints its
  w-token window; a window is duplicated iff its token tuple occurs
  >= 2 times corpus-wide (all (doc, pos) occurrences count, including
  two inside one document);
- duplicated starts merge into maximal islands when the next start is
  within ``w`` of the previous; a span covers [first, last + w - 1];
- the keep-first variant ranks each tuple's occurrences by (doc_id, i)
  and dooms ranks 2..n only, then cuts every token position covered by
  a doomed island; documents losing every token drop out.

A tiny token alphabet makes the generator adversarial by construction:
repeats of length exactly w, runs of overlapping duplicated windows,
and boundary-straddling copies all occur constantly at |alphabet|=3
and doc length <= 24, and hypothesis shrinks any violation to the
minimal corpus."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv2db_spark.llm import dedup as D

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# non-empty docs over a 3-token alphabet: collisions are the common
# case, not the lucky one (split(" ") of "" would mint a [""] token —
# the generator sidesteps that representation question; min doc = 1)
_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=24)
_corpus = st.lists(_doc, min_size=1, max_size=6)
_w = st.sampled_from([2, 3, 5])


def _merge(starts: list[int], w: int) -> list[tuple[int, int, int]]:
    """Gaps-and-islands over sorted 1-based starts: (first, last, n)."""
    out: list[list[int]] = []
    for i in sorted(starts):
        if out and i - out[-1][1] <= w:
            out[-1][1] = i
            out[-1][2] += 1
        else:
            out.append([i, i, 1])
    return [tuple(x) for x in out]


def _model_spans(corpus: dict[int, list[str]], w: int):
    freq: Counter = Counter()
    for toks in corpus.values():
        freq.update(
            tuple(toks[i : i + w]) for i in range(len(toks) - w + 1)
        )
    rows = []
    for d, toks in corpus.items():
        starts = [
            i + 1
            for i in range(len(toks) - w + 1)
            if freq[tuple(toks[i : i + w])] >= 2
        ]
        for first, last, n in _merge(starts, w):
            rows.append((d, first, last + w - 1, last - first + w, n))
    return sorted(rows)


def _model_remove(corpus: dict[int, list[str]], w: int):
    occs: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for d in sorted(corpus):
        toks = corpus[d]
        for i in range(len(toks) - w + 1):
            occs[tuple(toks[i : i + w])].append((d, i + 1))
    doomed: dict[int, list[int]] = defaultdict(list)
    for lst in occs.values():
        for d, i in sorted(lst)[1:]:
            doomed[d].append(i)
    rows = []
    for d, toks in corpus.items():
        cut: set[int] = set()
        for first, last, _ in _merge(doomed[d], w):
            cut.update(range(first, last + w))  # .. last + w - 1 incl.
        kept = [t for j, t in enumerate(toks, 1) if j not in cut]
        if kept:
            rows.append((d, " ".join(kept), len(kept)))
    return sorted(rows)


def _df(spark, corpus: dict[int, list[str]]):
    return spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in corpus.items()],
        "doc_id long, text string",
    )


@given(docs=_corpus, w=_w)
@settings(**_SETTINGS)
def test_duplicated_spans_matches_brute_force(spark, docs, w):
    corpus = {100 + i: toks for i, toks in enumerate(docs)}
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in D.duplicated_spans(_df(spark, corpus), w=w).collect()
    )
    assert got == _model_spans(corpus, w)


@given(docs=_corpus, w=_w)
@settings(**_SETTINGS)
def test_duplicated_window_stats_matches_brute_force(spark, docs, w):
    """The stats sibling (how MUCH is copied, not which tokens): every
    doc reports its window count and how many of its windows occur >= 2
    times corpus-wide — including twice within the same document."""
    corpus = {100 + i: toks for i, toks in enumerate(docs)}
    freq: Counter = Counter()
    for toks in corpus.values():
        freq.update(tuple(toks[i : i + w]) for i in range(len(toks) - w + 1))
    want = sorted(
        (
            d,
            max(0, len(toks) - w + 1),
            sum(
                freq[tuple(toks[i : i + w])] >= 2
                for i in range(len(toks) - w + 1)
            ),
        )
        for d, toks in corpus.items()
        if len(toks) >= w  # size<w docs emit no windows, hence no row
    )
    got = sorted(
        (r.doc_id, r.n_windows, r.n_dup_windows)
        for r in D.duplicated_window_stats(_df(spark, corpus), w=w).collect()
    )
    assert got == want


@given(docs=_corpus, w=_w)
@settings(**_SETTINGS)
def test_remove_duplicated_spans_matches_brute_force(spark, docs, w):
    corpus = {100 + i: toks for i, toks in enumerate(docs)}
    got = sorted(
        (r.doc_id, r.clean_text, r.n_tokens)
        for r in D.remove_duplicated_spans(_df(spark, corpus), w=w).collect()
    )
    assert got == _model_remove(corpus, w)


def test_span_edges_engineered(spark):
    """The named adversarial shapes, pinned deterministically: a repeat
    of length exactly w (one window each side), overlapping repeats
    whose duplicated windows straddle and chain across span boundaries,
    and a within-document repeat (keep-first must doom the SECOND
    occurrence inside the same doc)."""
    w = 3
    corpus = {
        # doc 1 / doc 2 share exactly one w-token phrase ("a b c"):
        # one duplicated window per doc, span_tokens == w exactly
        1: "a b c x y z".split(),
        2: "p q a b c".split(),
        # doc 3 repeats "m n o" twice WITHIN itself, overlapping a
        # shared boundary phrase: windows chain into one island
        3: "m n o m n o".split(),
    }
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in D.duplicated_spans(_df(spark, corpus), w=w).collect()
    )
    assert got == _model_spans(corpus, w)
    # doc 1: span [1,3]; doc 2: span [3,5]; doc 3: starts {1,4} merge
    # (4 - 1 <= w) into ONE island [1,6]
    assert got == [(1, 1, 3, 3, 1), (2, 3, 5, 3, 1), (3, 1, 6, 6, 2)]

    removed = sorted(
        (r.doc_id, r.clean_text, r.n_tokens)
        for r in D.remove_duplicated_spans(_df(spark, corpus), w=w).collect()
    )
    assert removed == _model_remove(corpus, w)
    # keep-first: doc 1 keeps everything (rank-1 occurrence of "a b c");
    # doc 2 loses tokens 3..5; doc 3's second "m n o" (start 4) is
    # doomed — tokens 4..6 cut, first copy survives
    assert removed == [
        (1, "a b c x y z", 6),
        (2, "p q", 2),
        (3, "m n o", 3),
    ]
