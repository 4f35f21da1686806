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
