"""Op-sequence fuzz for the snapshot table format (snapshots.py):
random interleavings of append / overwrite / delete_where / merge_into
/ rollback, cross-checked against a pure-Python bag model after EVERY
published version — the transactional claims (append-only history,
every old version readable verbatim, copy-on-write never corrupts
untouched rows) hold for sequences no fixture test enumerates.

Model semantics, from the operators' contracts:
- append: bag union with the head;
- overwrite: replace the head outright;
- delete_where(k >= c): SQL DELETE — rows where the predicate is TRUE
  leave, everything else (including a version-less no-hit) stays, and
  a new version publishes either way;
- merge_into(src, on='k'): every matched target row leaves (duplicate
  target keys collapse), the whole source unions in once;
- rollback(v): forward commit with version v's exact content.

Every version accumulated by the model is re-read and compared at the
end — not just the head — so a later op corrupting an EARLIER
version's files (the copy-on-write invariant) cannot hide.
"""

from __future__ import annotations

import tempfile
from collections import Counter

import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from csv2db_spark.snapshots import SnapshotTable

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-50, 50)),
    min_size=0,
    max_size=6,
)
_rows1 = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-50, 50)),
    min_size=1,
    max_size=6,
)
# merge sources need unique keys (the ANSI MERGE multi-match rule)
_merge_src = st.dictionaries(
    st.integers(0, 9), st.integers(-50, 50), min_size=1, max_size=5
)

_op = st.one_of(
    st.tuples(st.just("append"), _rows1),
    st.tuples(st.just("overwrite"), _rows1),
    st.tuples(st.just("delete_ge"), st.integers(0, 9)),
    st.tuples(st.just("merge"), _merge_src),
    # rollback target picked by INDEX into the versions list (mod len)
    st.tuples(st.just("rollback"), st.integers(0, 31)),
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val long")


@given(initial=_rows1, ops=st.lists(_op, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_snapshot_op_sequences_match_bag_model(spark, initial, ops):
    # mkdtemp per EXAMPLE (tmp_path is function-scoped and hypothesis
    # reuses the fixture across examples — create() would conflict);
    # removed in the finally so fuzz runs don't litter /tmp
    table_dir = tempfile.mkdtemp(prefix="c2s_fuzz_")
    try:
        _run_sequence(spark, table_dir, initial, ops)
    finally:
        import shutil

        shutil.rmtree(table_dir, ignore_errors=True)


def _run_sequence(spark, table_dir, initial, ops):
    t = SnapshotTable(spark, table_dir)
    t.create(_df(spark, initial))
    model: dict[int, Counter] = {1: Counter(initial)}
    head = Counter(initial)
    v = 1
    for op, arg in ops:
        if op == "append":
            got_v = t.append(_df(spark, arg))
            head = head + Counter(arg)
        elif op == "overwrite":
            got_v = t.overwrite(_df(spark, arg))
            head = Counter(arg)
        elif op == "delete_ge":
            got_v = t.delete_where(F.col("k") >= arg)
            head = Counter({r: c for r, c in head.items() if r[0] < arg})
        elif op == "merge":
            src = sorted(arg.items())
            got_v = t.merge_into(_df(spark, src), on="k")
            head = Counter(
                {r: c for r, c in head.items() if r[0] not in arg}
            ) + Counter(src)
        else:  # rollback
            versions = sorted(model)
            target = versions[arg % len(versions)]
            got_v = t.rollback(target)
            head = Counter(model[target])
        v += 1
        assert got_v == v, f"{op} published {got_v}, expected {v}"
        model[v] = Counter(head)
    # every version the model accumulated reads back verbatim
    assert t.versions() == sorted(model)
    for ver, want in model.items():
        got = Counter((r.k, r.val) for r in t.read(ver).collect())
        assert got == want, f"version {ver} diverged after {ops}"
