"""Top-k operators.

``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: each task
keeps a k-element heap and only k rows per partition reach the driver —
no global sort, no full shuffle. That is already the optimal distributed
plan, so top_k is a thin wrapper kept for API parity.

Grouped top-k uses a ranking window: one hash shuffle on the group key,
in-partition sort, early filter on the rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order: Column | str) -> DataFrame:
    return df.orderBy(*order).limit(k)


def grouped_top_k(
    df: DataFrame,
    group: list[str],
    k: int,
    *order: Column | str,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def weighted_percentile(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
    p_num: int,
    p_den: int,
    out_col: str = "wpct",
) -> DataFrame:
    """Exact weighted percentile per group: the smallest value whose
    cumulative weight reaches p = p_num/p_den of the group's total —
    weighted median (1/2), weighted p90 (9/10), etc. The
    inventory/revenue form of a percentile: "the price point below
    which half the QUANTITY trades", not half the rows.

    Wholly integer: the rational threshold test is cross-multiplied
    (p_den·cumW ≥ p_num·W), cumulative and total weights are exact
    sums, and the result is a SELECTED input value — no float appears
    anywhere, so the gate hash-matches trivially. Because cumulative
    weight is monotone in value order, the satisfying rows form a
    suffix and MIN(value) over them is the boundary value — no
    row_number re-pass needed.

    One per-group sort for the running weight + a |groups|-row
    broadcast of totals. Overflow: p_den·cumW must fit int64 — with
    integer weights that is 9.2e18/p_den total weight per group."""
    from pyspark.sql import Window

    w_run = (
        Window.partitionBy(*key_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = df.select(
        *key_cols,
        value_col,
        F.sum(weight_col).over(w_run).alias("_cumw"),
    )
    totals = df.groupBy(*key_cols).agg(F.sum(weight_col).alias("_w"))
    return (
        cum.join(F.broadcast(totals), key_cols)
        .where(F.lit(p_den) * F.col("_cumw") >= F.lit(p_num) * F.col("_w"))
        .groupBy(*key_cols)
        .agg(F.min(value_col).alias(out_col))
    )
