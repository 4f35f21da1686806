"""File-level data skipping for plain parquet directories: a min/max
manifest plus a pruned reader — the core of what table formats
(Delta/Iceberg) add over raw parquet, expressed as two small DataFrame
ops with no new storage format.

Spark's parquet reader already skips ROW GROUPS via footer statistics,
but it must still list, open, and read the footer of EVERY file; at
100 TB with millions of files that per-file tax dominates selective
scans. A manifest read once (or maintained incrementally at write time)
turns a selective read into: scan the tiny manifest, keep the files
whose [min, max] intersects the predicate, and hand Spark ONLY those
paths — the others are never opened.

Correctness contract: pruning is safe, never semantic — the pruned read
applies the SAME predicate afterwards, so a file that survives pruning
but contains no matching rows contributes nothing. Tests pin both the
equality of results and the strict reduction in files read. Pairs with
``sink.write_sorted_parquet``: range-partitioned files have disjoint
[min, max] spans, so pruning selects ~(selectivity x files) instead of
every file.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_minmax_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One row per parquet file with per-column min/max: the manifest a
    selective reader prunes against. Built with one pass over the data
    (each file's rows aggregate map-side within their own input split);
    at scale you maintain it incrementally per written file instead of
    rebuilding — the schema (file, <col>_min, <col>_max) is the same.
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
    )


def read_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read only the files whose [min, max] span for ``col`` intersects
    [lo, hi], then apply the exact predicate. The manifest filter runs
    on |files| rows (driver-collectible by construction — a manifest is
    KB per thousand files); the returned DataFrame is a normal parquet
    scan over the surviving paths, so all the usual pushdown applies on
    top."""
    keep = [
        r["_file"]
        for r in manifest.where(
            (F.col(f"{col}_max") >= F.lit(lo)) & (F.col(f"{col}_min") <= F.lit(hi))
        )
        .select("_file")
        .collect()
    ]
    if not keep:
        # empty selection: preserve schema by reading the full dir's
        # schema with an always-false filter on zero files is impossible;
        # read one file lazily and filter-false instead
        any_file = manifest.select("_file").limit(1).collect()
        if not any_file:
            raise ValueError("read_pruned: empty manifest")
        return (
            spark.read.parquet(any_file[0]["_file"]).where(F.lit(False))
        )
    return (
        spark.read.parquet(*keep)
        .where((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )


def files_in_dir(path: str) -> int:
    """Top-level parquet file count (test/diagnostic helper)."""
    return len(list(Path(path).glob("*.parquet")))
