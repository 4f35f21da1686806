"""Unit tests for the iterative connected-components operator and
merge-by-key upsert (semantics beyond the oracle parity gate)."""

from __future__ import annotations

import pytest

from csv2db_spark.operators.graph import connected_components
from csv2db_spark.operators.merge import upsert


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4, island 10-11, self-contained pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)], ["src", "dst"]
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_converges_on_long_chain(spark):
    # 0-1-2-...-40: diameter >> typical; min label must still propagate
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["src", "dst"]
    )
    got = {r.node: r.component for r in connected_components(edges, max_iter=50).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_upsert_update_insert_survive(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "B"), (9, "Z")], ["k", "v"]
    )
    got = {r.k: r.v for r in upsert(base, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "Z"}


def test_upsert_rejects_schema_mismatch(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame([(1, "a", 2)], ["k", "v", "extra"])
    with pytest.raises(ValueError):
        upsert(base, changes, ["k"])


def test_star_cc_matches_min_label_on_assorted_graphs(spark):
    from csv2db_spark.operators.graph import connected_components_star

    cases = [
        # chain + islands + reversed pair (same as the min-label test)
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        # triangle with a tail, plus a self-loop that must be ignored
        [(5, 6), (6, 7), (7, 5), (7, 8), (9, 9)],
        # two components joined late by a bridge edge
        [(1, 2), (3, 4), (2, 3)],
        # duplicate and reoriented edges
        [(1, 2), (2, 1), (1, 2), (4, 3)],
    ]
    for rows in cases:
        edges = spark.createDataFrame(rows, ["src", "dst"])
        want = {
            r.node: r.component for r in connected_components(edges).collect()
        }
        got = {
            r.node: r.component
            for r in connected_components_star(edges).collect()
        }
        assert got == want, rows


def test_star_cc_path_converges_in_log_rounds(spark):
    # a 200-node path has diameter 199: min-label propagation needs ~200
    # rounds; star contraction must finish in O(log n) — the reason the
    # variant exists
    from csv2db_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], ["src", "dst"]
    )
    got = {
        r.node: r.component
        for r in connected_components_star(edges, max_iter=15).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 200
    assert connected_components_star.last_rounds <= 10


def test_star_cc_random_graph_matches(spark):
    import random

    from csv2db_spark.operators.graph import connected_components_star

    rng = random.Random(7)
    rows = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(90)
    ]
    rows = [(a, b) for a, b in rows if a != b]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    want = {r.node: r.component for r in connected_components(edges).collect()}
    got = {
        r.node: r.component for r in connected_components_star(edges).collect()
    }
    assert got == want


def test_resolve_hierarchy_pointer_doubling(spark):
    from csv2db_spark.operators.graph import resolve_hierarchy

    # two trees + a deep chain: 0->1->2->3->4 and 10<-11, 10<-12
    edges = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2), (4, 3), (11, 10), (12, 10)],
        "child long, parent long",
    )
    out = {r.node: (r.root, r.depth) for r in resolve_hierarchy(edges).collect()}
    assert out[0] == (0, 0) and out[4] == (0, 4) and out[2] == (0, 2)
    assert out[11] == (10, 1) and out[12] == (10, 1) and out[10] == (10, 0)
    assert len(out) == 8  # 6 children + 2 roots


def test_resolve_hierarchy_detects_cycles(spark):
    import pytest as _pytest

    from csv2db_spark.operators.graph import resolve_hierarchy

    edges = spark.createDataFrame([(1, 2), (2, 1)], "child long, parent long")
    with _pytest.raises(ValueError, match="cycle"):
        resolve_hierarchy(edges, max_rounds=6).collect()
