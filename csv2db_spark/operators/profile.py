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

from pyspark.sql import DataFrame
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
