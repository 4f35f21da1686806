"""Partitioned JDBC SOURCE reads — the inverse of sink.write_jdbc.

The reference tool only loads INTO a database; a user migrating to this
engine also needs the other direction — lifting an existing DB table
into the cluster to join it against the lake. Spark's JDBC source
defaults to ONE connection reading the whole table through one task,
which caps ingest at single-connection speed no matter how many
executors exist; the scale path is ``partitionColumn`` + bounds +
``numPartitions``, which turns the read into N concurrent range queries
(``WHERE col >= lo AND col < hi``) the database can serve in parallel.
This module wraps that recipe with automatic bounds probing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Conservative identifier grammar: optional schema qualifier, each part
# either a bare word or already-quoted ("..." / `...`) with no embedded
# quote characters. Everything else is refused BEFORE interpolation into
# the pushed-down SQL — table/column names here come from config, and
# config-driven SQL injection on the probe connection is exactly the
# hole the reference avoids by building statements from validated
# config (main.go flag parsing feeds pq.QuoteIdentifier).
_IDENT_PART = r'(?:[A-Za-z_][A-Za-z0-9_$]*|"[^"]+"|`[^`]+`)'
_IDENT_RE = re.compile(rf"^{_IDENT_PART}(?:\.{_IDENT_PART})?$")


def _check_identifier(name: str, what: str) -> str:
    if not _IDENT_RE.match(name):
        raise ValueError(
            f"unsafe {what} {name!r}: use a plain or pre-quoted SQL "
            "identifier (optionally schema-qualified)"
        )
    return name


def _probe_bounds(
    spark: SparkSession,
    url: str,
    table: str,
    col: str,
    user: str = "",
    password: str = "",
) -> tuple:
    """One ``SELECT MIN(col), MAX(col)`` pushed to the database.

    Identifier-folding differs per engine (Derby/PG fold unquoted names,
    Spark's own writer CREATEs quoted exact-case columns), so the probe
    tries the bare spelling first and retries quoted with the dialect's
    identifier quote — covering both a pre-existing unquoted table and
    one our writer created."""
    _check_identifier(table, "table name")
    _check_identifier(col, "partition column")
    quote = "`" if url.startswith("jdbc:mysql") else '"'
    last: Exception | None = None
    for c in (col, f"{quote}{col}{quote}"):
        try:
            probe = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "query",
                    f"SELECT MIN({c}) AS lo, MAX({c}) AS hi FROM {table}",
                )
            )
            if user:
                probe = probe.option("user", user).option("password", password)
            row = probe.load().collect()[0]
            return (row[0], row[1])
        except Exception as exc:  # noqa: BLE001 - dialect probe
            last = exc
    raise last


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_col: str | None = None,
    num_partitions: int = 8,
    bounds: tuple | None = None,
    fetchsize: int = 1000,
    user: str = "",
    password: str = "",
) -> DataFrame:
    """Read a JDBC table, split into ``num_partitions`` concurrent range
    scans over ``partition_col`` when one is given (numeric/date column;
    pick an indexed, roughly-uniform key — Spark splits [lo, hi] into
    equal-width stripes, so a skewed key piles rows into one stripe).

    ``bounds`` is (lowerBound, upperBound); when omitted it is probed
    with ONE pushed-down ``SELECT MIN(col), MAX(col)`` — a single
    index-range query on any sane schema, and the same probe every
    parallel-export tool runs first. Rows outside the bounds are still
    read (Spark makes the first/last stripes unbounded), so a stale
    probe can skew but never lose data. ``fetchsize`` keeps the
    per-connection cursor streaming instead of buffering the stripe.

    Without ``partition_col`` this is the plain single-connection read —
    correct for dimension-sized tables that broadcast afterwards
    anyway."""
    _check_identifier(table, "table name")
    if partition_col is not None:
        _check_identifier(partition_col, "partition column")
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if user:
        reader = reader.option("user", user).option("password", password)
    if partition_col is None:
        return reader.load()
    if bounds is None:
        bounds = _probe_bounds(spark, url, table, partition_col, user, password)
    if bounds[0] is None:  # empty table: nothing to stripe
        return reader.load()
    return (
        reader.option("partitionColumn", partition_col)
        .option("lowerBound", str(bounds[0]))
        .option("upperBound", str(bounds[1]))
        .option("numPartitions", str(num_partitions))
        .load()
    )
