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
