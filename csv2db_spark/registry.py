"""Query registry backing the driver contract (__spark_entry__.py).

Every implemented operator registers a named query (a callable
``(spark, sf_dir) -> DataFrame``) and, when expressible in ANSI SQL, a
DuckDB oracle string over the same fixture tables. The driver hash-compares
the two at sf=0.01; tests/test_parity.py does the same locally at sf=0.001.

Numeric-parity rule (see functions/numeric.py): aggregate money/ratio
columns through exact DECIMAL arithmetic, cast the exact result to double,
then round — identical bits on both engines regardless of summation order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name, fn, oracle, bench)
        return fn

    return deco


def load_all_queries() -> dict[str, QueryDef]:
    """Import every module that registers queries, then return the registry."""
    # Imports are deferred so `import csv2db_spark` stays cheap.
    from csv2db_spark import queries as _q  # noqa: F401

    return REGISTRY
