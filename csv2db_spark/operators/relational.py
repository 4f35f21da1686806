"""Join helpers beyond plain equi-joins.

The reference has no joins at all (SURVEY.md §2.2) — this module is part
of the analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value: str | Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Band/range join: match each fact row to the range row(s) with
    ``lo <= value < hi``.

    The ranges side is explicitly broadcast: a range join has no equi-key,
    so without the hint Spark would fall back to a cartesian
    BroadcastNestedLoopJoin anyway — making the small side the broadcast
    side keeps it O(|facts| * |ranges|) with |ranges| tiny and NO shuffle
    of the fact table. For large range tables, bucketize the value column
    into an equi-join key instead (see queries/relational.py for the
    pattern).
    """
    v = F.col(value) if isinstance(value, str) else value
    cond = (v >= F.col(lo)) & (v < F.col(hi))
    return facts.join(F.broadcast(ranges), cond, how)
