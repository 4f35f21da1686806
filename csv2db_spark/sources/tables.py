"""Parquet fixture tables (TESTDATA.md).

``load_table`` is a thin wrapper over ``spark.read.parquet`` — scans stay
fully declarative so Catalyst applies column pruning and filter pushdown to
the parquet reader (verify with ``df.explain``: ``PushedFilters`` /
``ReadSchema``).

Special case — ``events``: the fixture stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
(PARQUET_TYPE_ILLEGAL). We read it via the ``nanosAsLong`` legacy conf and
rebuild a TIMESTAMP_NTZ with pure interval arithmetic from epoch — no
session-timezone dependence, so results match a naive-timestamp oracle
regardless of the host TZ. Nanos are floor-truncated to micros, exactly
what DuckDB/pyarrow do on the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation"})

# Epoch-anchored NTZ reconstruction: micros -> interval -> naive timestamp.
_NS_TO_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
    "make_interval(0, 0, 0, 0, 0, 0, CAST({c} DIV 1000 AS DECIMAL(26,6)) / 1000000)"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr(_NS_TO_NTZ.format(c="ts")))
    return df
