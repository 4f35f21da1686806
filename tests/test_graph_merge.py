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
