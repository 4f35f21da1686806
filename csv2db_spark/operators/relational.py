"""Join helpers beyond plain equi-joins.

The reference has no joins at all (SURVEY.md §2.2) — this module is part
of the analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A 64-bit key column is ~8 bytes + row overhead; 50M keys is comfortably
# inside a 10 GB broadcast threshold on a production driver/executor and
# far beyond anything a bounded candidate set produces at gate scale.
DROP_LIST_BROADCAST_MAX_ROWS = 50_000_000


def anti_join_drop_list(
    big: DataFrame,
    drop: DataFrame,
    on: str | list[str],
    max_broadcast_rows: int = DROP_LIST_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """``big LEFT ANTI JOIN drop`` with a SIZE-GATED broadcast hint.

    Dedup/decontamination pipelines end with "drop these ids from the
    corpus". When the drop list is small (the common case: bounded
    candidate sets, benchmark contamination), broadcasting it keeps the
    text-carrying corpus off the shuffle entirely — the single biggest
    shuffle saving in those plans. But at web-corpus scale a near-dup
    loser set can be a large FRACTION of the corpus, and a forced
    ``F.broadcast`` overrides Spark's size-based planning and OOMs the
    driver. So: count the (already-computed, typically checkpointed)
    drop side first, and fall back to Spark's own join planning — AQE
    picks SMJ or broadcast from runtime stats — when it exceeds
    ``max_broadcast_rows``. The count is one cheap job over the
    key-only drop list, never over ``big``.
    """
    if drop.count() <= max_broadcast_rows:
        drop = F.broadcast(drop)
    return big.join(drop, on, "left_anti")


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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bin_width: int,
    a_lo: str = "a_lo",
    a_hi: str = "a_hi",
    b_lo: str = "b_lo",
    b_hi: str = "b_hi",
) -> DataFrame:
    """Interval-overlap join for TWO LARGE sides — the genomics /
    session-collision shape ``range_join`` (broadcast, one tiny side)
    cannot handle: every (a, b) pair with [a_lo, a_hi) ∩ [b_lo, b_hi) ≠ ∅.

    Bin blocking: each interval explodes into the fixed-width bins it
    touches ((hi−lo)/width + 1 rows — bounded when interval length is),
    the join is an EQUI-join on the bin id (hash-partitionable, no
    cartesian), and the overlap predicate filters false bin-neighbors.
    A pair sharing k bins would appear k times; instead of a distinct
    (a second full shuffle) each pair is emitted only in its FIRST
    shared bin — ``bin == max(floor(a_lo/w), floor(b_lo/w))`` — which is
    the standard dedup-free trick: exactly one bin satisfies it per
    overlapping pair, so the output is exact with zero extra shuffles.

    Endpoints are exact integers (caller converts timestamps to epoch
    days/seconds), so blocking, predicate, and emission rule are all
    integer arithmetic — hash-reproducible. Intervals are half-open and
    expected non-empty (lo < hi); a degenerate [x, x) behaves as the
    point x under the overlap predicate — identically on both engines.

    Scale shape (100 TB): shuffle = interval rows × bins-per-interval on
    the bin key; pick ``bin_width`` near the typical interval length so
    that factor stays 1–2. Skewed hot bins (everything overlapping one
    time window) salt like any hot equi-key (see skew.salted_join)."""
    w = bin_width

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / w).cast("long"),
                    F.floor((F.col(hi) - 1) / w).cast("long"),
                )
            ),
        )

    ab = binned(a, a_lo, a_hi)
    bb = binned(b, b_lo, b_hi)
    first_bin = F.greatest(
        F.floor(F.col(a_lo) / w).cast("long"),
        F.floor(F.col(b_lo) / w).cast("long"),
    )
    return (
        ab.join(bb, "_bin")
        .where(
            (F.col(a_lo) < F.col(b_hi))
            & (F.col(b_lo) < F.col(a_hi))
            & (F.col("_bin") == first_bin)
        )
        .drop("_bin")
    )
