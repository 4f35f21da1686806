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

from pyspark.sql import Column, DataFrame, Window
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


def chi_square_cells(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson χ² independence audit of two categorical columns — the
    standard "is the treatment assignment actually independent of the
    segment" / sample-ratio-mismatch check, emitted PER CELL so every
    number is hash-exact: observed count O, row/column/grand totals
    (R, C, N — exact integers via three window sums over the ≤
    |rows|·|cols| contingency cells), and the cell's χ² contribution

        (O·N − R·C)² / (N·R·C)

    computed two ways: an exact integer ``contrib_e6`` =
    ⌊10⁶·(O·N−R·C)²/(N·R·C)⌋ in DECIMAL(38,0) (numerator ≤ 1e26 at
    10⁵ rows per margin — order-independent, summable downstream as
    exact longs), and the double ``contribution`` from the same exact
    operands in fixed order. Leaving the global Σ to the caller keeps
    the gate free of float-summation order; the exact e6 column is the
    one to total.

    One corpus-sized groupBy; everything after runs on the tiny
    contingency table."""
    cells = df.groupBy(
        F.col(row_col).alias("row_key"), F.col(col_col).alias("col_key")
    ).agg(F.count(F.lit(1)).alias("observed"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_r = Window.partitionBy("row_key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_c = Window.partitionBy("col_key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = (
        cells.withColumn("row_total", F.sum("observed").over(w_r))
        .withColumn("col_total", F.sum("observed").over(w_c))
        .withColumn("grand_total", F.sum("observed").over(w_all))
    )
    d38 = "decimal(38,0)"
    num = F.col("observed").cast(d38) * F.col("grand_total").cast(
        d38
    ) - F.col("row_total").cast(d38) * F.col("col_total").cast(d38)
    den = (
        F.col("grand_total").cast(d38)
        * F.col("row_total").cast(d38)
        * F.col("col_total").cast(d38)
    )
    out = t.select(
        "row_key",
        "col_key",
        "observed",
        "row_total",
        "col_total",
        "grand_total",
        (
            (F.lit(1_000_000).cast(d38) * num * num).cast(d38)
        ).alias("_num_e6"),
        den.alias("_den"),
        (
            (num.cast("double") * num.cast("double"))
            / (
                (
                    F.col("grand_total").cast("double")
                    * F.col("row_total").cast("double")
                )
                * F.col("col_total").cast("double")
            )
        ).alias("contribution"),
    )
    # integer floor division of the exact decimals: `div` keeps the
    # whole-number quotient as a long without decimal-scale rounding
    return out.withColumn(
        "contrib_e6", F.expr("CAST(_num_e6 div _den AS BIGINT)")
    ).drop("_num_e6", "_den")
