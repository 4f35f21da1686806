"""Experiment-analysis statistics.

``q_events_ab_lift`` reads out conversion-rate lift; this module adds
the CONTINUOUS-metric readout: Welch's unequal-variance t statistic,
the default two-sample test for revenue-per-user-style metrics.

Cross-engine exactness discipline (functions/numeric.py): each group
reduces to exact-decimal sufficient statistics (n, Σy, Σy²) in one
map-side-combined pass; means, variances, and the t statistic are then
a FIXED-ORDER chain of IEEE ops on those exact inputs — identical bits
on any engine, so the statistic itself is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def welch_t_test(
    df: DataFrame,
    group_col: str,
    y: Column,
    group_a: str = "control",
    group_b: str = "treatment",
) -> DataFrame:
    """One-row Welch t readout for ``group_b`` vs ``group_a``:
    (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat) with
    t = (mean_b - mean_a) / sqrt(var_b/n_b + var_a/n_a) and sample
    variance var = (n·Σy² - (Σy)²) / (n·(n-1)) — the numerator is an
    exact decimal, so the variance is one division of exact integers.
    ``y`` must be a DECIMAL quantization of the metric.

    Scale shape: one map-combined aggregation over the metric rows
    (3 numbers per group per task on the wire), then a 2-row join —
    nothing downstream of the scan is data-sized."""
    s = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("sx"),
        F.sum(y * y).alias("sxx"),
    )

    def side(tag: str, name: str) -> DataFrame:
        mean = F.col("sx").cast("double") / F.col("n")
        var = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        ) / (F.col("n").cast("double") * (F.col("n") - 1))
        return s.where(F.col(group_col) == tag).select(
            F.col("n").alias(f"n_{name}"),
            mean.alias(f"mean_{name}"),
            var.alias(f"var_{name}"),
        )

    a, b = side(group_a, "a"), side(group_b, "b")
    t = (F.col("mean_b") - F.col("mean_a")) / F.sqrt(
        F.col("var_b") / F.col("n_b") + F.col("var_a") / F.col("n_a")
    )
    return a.crossJoin(b).select(
        "n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b",
        t.alias("t_stat"),
    )
