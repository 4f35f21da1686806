"""One-pass relational column profiler (data-quality survey).

``profile_columns`` computes per-column row/null/distinct counts and
numeric min/max in a SINGLE aggregation job: all statistics for all
columns evaluate in one partial+final HashAggregate pass over the scan
(count_distinct expands via Spark's multi-distinct EXPAND plan), then
one row per column is produced driver-side from the 1-row result — a
constant-size literal pivot, not a per-column scan. At 100 TB this costs
exactly one table pass regardless of column count.

Output is engine-portable: min/max are reported only for numeric
columns (as doubles) — string/timestamp extrema would hash-diverge on
formatting across engines, and the numeric band is what profiling
consumers act on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(df: DataFrame) -> DataFrame:
    aggs: list = []
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs.append(F.count(F.lit(1)).alias("_n"))
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.col(f"_mn_{c}") if c in numeric else F.lit(None).cast("double"))
            .alias("min_num"),
            (F.col(f"_mx_{c}") if c in numeric else F.lit(None).cast("double"))
            .alias("max_num"),
        )
        for c in df.columns
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def histogram_quantile(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 100,
    qs: tuple[int, ...] = (25, 50, 75, 90),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Histogram-based quantile estimates that are HASH-CHECKABLE —
    the deterministic alternative to ``approx_percentile`` (t-digest:
    merge-order-dependent, opaque blob, rows-only gate). Values are
    binned into ``n_buckets`` equal-width buckets over [lo, hi)
    (clamped at both ends), and each requested percentile q (an INTEGER
    percent, so the rank target ceil(q*N/100) is exact integer
    arithmetic) is linearly interpolated inside the first bucket whose
    cumulative count reaches the target. Estimation error is bounded by
    one bucket width; every input to the final two IEEE ops (one
    multiply, one divide) is an exact integer, so both engines emit
    identical bits.

    Returns (group_cols..., q, target_rank, bucket, est_value). Scale
    shape: one map-side-combined groupBy((group, bucket)) — the shuffle
    carries at most n_buckets rows per group per partition — then an
    n_buckets-row cumulative window per group. The corpus is scanned
    once; at 100 TB this is the scan-bound pattern, identical to any
    aggregate. ``group_cols`` gives per-group percentiles (per-language
    length distributions etc.) with the same exactness — the windows
    key on the group, so group count scales freely.
    """
    counts = histogram_cells(df, col, lo, hi, n_buckets, group_cols)
    return histogram_quantile_from_cells(
        counts, lo, hi, n_buckets, qs, group_cols
    )


def histogram_cells(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The binning half of ``histogram_quantile``: equal-width bucket
    counts (group_cols..., bucket, cnt). Split out because the cells
    are a MERGEABLE sketch — partials from disjoint batches fold by
    plain SUM on (group, bucket) — which is what the streaming rollup
    (q_stream_histogram_rollup) maintains incrementally."""
    group_cols = list(group_cols or [])
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.greatest(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantile_from_cells(
    counts: DataFrame,
    lo: float,
    hi: float,
    n_buckets: int,
    qs: tuple[int, ...] = (25, 50, 75, 90),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The estimation half of ``histogram_quantile``: rank targets +
    in-bucket interpolation over an existing (group, bucket, cnt) cell
    table — built one-shot or merged incrementally, the estimates are
    identical (the mergeable-sketch contract the streaming gate
    hash-verifies)."""
    group_cols = list(group_cols or [])
    width = (hi - lo) / n_buckets
    df = counts
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        *group_cols,
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )
    spark = df.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame([(int(q),) for q in qs], ["q"])
    )
    # target rank = ceil(q*N/100) via integer arithmetic
    target = -F.floor(-(F.col("q") * F.col("n")) / 100)
    hits = (
        cum.crossJoin(qdf)
        .withColumn("target_rank", target.cast("long"))
        .where(F.col("cum") >= F.col("target_rank"))
    )
    ww = Window.partitionBy(*group_cols, "q").orderBy("bucket")
    first_hit = (
        hits.withColumn("_rn", F.row_number().over(ww))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # interpolate inside the bucket: lo + width*(bucket + frac)
    frac = (
        F.col("target_rank") - (F.col("cum") - F.col("cnt"))
    ).cast("double") / F.col("cnt")
    return first_hit.select(
        *group_cols,
        "q",
        "target_rank",
        "bucket",
        (F.lit(lo) + F.lit(width) * (F.col("bucket") + frac)).alias("est_value"),
    )


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Column-level drift report between two snapshots of a table — the
    "did yesterday's load change shape?" check that belongs next to
    ``operators/quality.check_constraints`` (rules you declare) and
    ``operators/merge.snapshot_diff`` (row-level deltas): this one needs
    NO declared rules, it compares the table against its own past.

    One ``profile_columns`` pass per side (each a single map-combined
    aggregate + one distinct per column), then a full-outer join on the
    column name. Returns one row per column seen on either side:
    (col_name, status ∈ added|removed|type_changed|kept,
    old_type, new_type, and the old/new null counts, distinct counts and
    numeric ranges). All metrics are exact integers/extrema, so the
    report hash-matches. Detecting DISTRIBUTION drift beyond these
    moments is histogram_quantile's job — compare its per-snapshot
    outputs."""
    types_old = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    types_new = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    po = profile_columns(old).select(
        F.col("col_name"),
        F.col("n_nulls").alias("old_nulls"),
        F.col("n_distinct").alias("old_distinct"),
        F.col("min_num").alias("old_min"),
        F.col("max_num").alias("old_max"),
    )
    pn = profile_columns(new).select(
        F.col("col_name"),
        F.col("n_nulls").alias("new_nulls"),
        F.col("n_distinct").alias("new_distinct"),
        F.col("min_num").alias("new_min"),
        F.col("max_num").alias("new_max"),
    )
    joined = po.join(pn, "col_name", "full_outer")
    ot = None
    for c, t in sorted(types_old.items()):
        cond = F.col("col_name") == c
        ot = F.when(cond, F.lit(t)) if ot is None else ot.when(cond, F.lit(t))
    nt = None
    for c, t in sorted(types_new.items()):
        cond = F.col("col_name") == c
        nt = F.when(cond, F.lit(t)) if nt is None else nt.when(cond, F.lit(t))
    old_type = ot if ot is not None else F.lit(None).cast("string")
    new_type = nt if nt is not None else F.lit(None).cast("string")
    status = (
        F.when(old_type.isNull(), F.lit("added"))
        .when(new_type.isNull(), F.lit("removed"))
        .when(old_type != new_type, F.lit("type_changed"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        "col_name",
        status.alias("status"),
        old_type.alias("old_type"),
        new_type.alias("new_type"),
        "old_nulls",
        "new_nulls",
        "old_distinct",
        "new_distinct",
        "old_min",
        "new_min",
        "old_max",
        "new_max",
    )
