"""Time-series resampling and gap filling over the events stream — the
hypertable-rollup / downsample-then-interpolate pattern of time-series
engines, expressed as DataFrame ops.

- ``time_bucket``: fixed-width bucket via FIELD arithmetic only
  (date_trunc + minute/hour modulo), so NTZ timestamps never round-trip
  through an epoch and results are independent of the session timezone —
  the same discipline as operators/sessions.py.
- ``resample``: one hash aggregation keyed (user, bucket) — map-side
  partial combine, no sort.
- ``gap_fill``: densify each key's own [min_bucket, max_bucket] span with
  ``sequence`` + explode, left-join observations, then forward-fill with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding row frame.

Scale shape (100 TB): everything shuffles on user_id (or the chosen key)
exactly once; the dense grid is generated per key AFTER aggregation —
grid rows = span/width per key, never events × buckets. A key whose span
is huge relative to the bucket (years of history at 1-minute grain)
bounds its own grid; pre-split by coarser windows if a single key's grid
must not exceed one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import dsum


def time_bucket(ts: Column, hours: int) -> Column:
    """Floor ``ts`` (NTZ) to an ``hours``-wide bucket, by field arithmetic
    (TZ-free): truncate to the hour, then subtract hour-of-day mod width.
    Widths that divide 24 keep buckets aligned to midnight every day."""
    return F.date_trunc("hour", ts) - F.make_interval(
        hours=F.hour(ts) % F.lit(hours)
    )


def resample(
    events: DataFrame,
    hours: int = 6,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Downsample to one row per (key, bucket): event count + exact-decimal
    value sum."""
    return (
        events.select(
            key_col,
            time_bucket(F.col(ts_col), hours).alias("bucket"),
            value_col,
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum(value_col, 18, 2), 2).alias("sum_value"),
        )
    )


def gap_fill(
    sampled: DataFrame,
    hours: int = 6,
    key_col: str = "user_id",
) -> DataFrame:
    """Densify each key's bucket span and forward-fill ``sum_value``.

    Returns one row per (key, bucket) over the key's own [min, max]
    bucket range: observed rows keep their stats, gap rows get
    n_events=0, sum_value NULL, and ``filled_value`` carries the last
    observed sum forward (NULL before the first observation —
    none exist here since spans start at an observed bucket)."""
    spans = sampled.groupBy(key_col).agg(
        F.min("bucket").alias("b_lo"), F.max("bucket").alias("b_hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                "b_lo", "b_hi", F.expr(f"INTERVAL '{int(hours)}' HOUR")
            )
        ).alias("bucket"),
    )
    dense = grid.join(sampled, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def interpolate_linear(
    dense: DataFrame,
    key_col: str = "user_id",
    value_col: str = "sum_value",
) -> DataFrame:
    """Linear interpolation across the gap rows of a densified series
    (run ``gap_fill`` first): each NULL value becomes
    ``prev + (next - prev) * (steps_from_prev / gap_width)``; a trailing
    run with no next observation forward-fills, a leading run with no
    previous observation backward-fills.

    All position arithmetic is integer (row numbers within the key) and
    the float expression is evaluated in one fixed order, so the result
    is engine-reproducible bit-for-bit. Two window passes over the same
    (key, bucket) sort — Spark executes them in a single exchange+sort.
    """
    order = Window.partitionBy(key_col).orderBy("bucket")
    wp = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    v = F.col(value_col)
    d = dense.withColumn("_rn", F.row_number().over(order))
    prev_v = F.last(value_col, ignorenulls=True).over(wp)
    next_v = F.first(value_col, ignorenulls=True).over(wn)
    prev_rn = F.last(F.when(v.isNotNull(), F.col("_rn")), ignorenulls=True).over(wp)
    next_rn = F.first(F.when(v.isNotNull(), F.col("_rn")), ignorenulls=True).over(wn)
    interp = prev_v + (next_v - prev_v) * (
        (F.col("_rn") - prev_rn).cast("double") / (next_rn - prev_rn)
    )
    return d.withColumn(
        "interp_value",
        F.when(v.isNotNull(), v).otherwise(F.coalesce(interp, prev_v, next_v)),
    ).drop("_rn")
