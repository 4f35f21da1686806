"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``csv2db_spark``: the engine registers every implemented
operator as a named query (csv2db_spark/queries/*) with a DuckDB oracle
where the semantics are ANSI-SQL-expressible; this module exposes them in
the driver's expected shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from csv2db_spark.registry import load_all_queries

SF0_001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    q = load_all_queries()["q01_pricing_summary"]
    return q.fn(spark, SF0_001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries get rows-only checks."""
    return {
        name: qd.oracle
        for name, qd in load_all_queries().items()
        if qd.oracle is not None
    }
