"""As-of join (point-in-time join) as a composition of built-in operators.

Spark's DataFrame API has no native as-of join (pandas-on-Spark's
``merge_asof`` exists but routes through a union trick internally anyway).
This implementation uses the classic scalable formulation:

    union(left tagged 1, right tagged 0)
      -> window over (by, ts, tag) rows unbounded-preceding..current
      -> last(right_payload, ignorenulls) carries the most recent right row
      -> filter tag==1

Scale properties: exactly ONE shuffle (hash-partition by ``by``) plus an
in-partition sort — identical cost shape to a sort-merge join, no
broadcast/materialization of either side, arbitrarily large both sides.
Skewed ``by`` keys behave like any skewed window (AQE cannot split a
window partition; salt upstream if one entity dominates).

Tie semantics: at equal timestamps the right row sorts BEFORE the left row
(tag 0 < 1), i.e. matches ``left.ts >= right.ts`` — the same rule as
DuckDB's ``ASOF JOIN`` (used as the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_payload: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right[on] <= left[on]`` within the same ``by`` group — or, with
    ``direction="forward"``, the NEAREST FOLLOWING right row
    (``right[on] >= left[on]``): the other half of pandas
    ``merge_asof`` semantics, same single-shuffle union+window plan
    with the sort reversed. Ties match in both directions (the right
    row sorts before the left at equal timestamps).

    Left rows with no prior (resp. following) right row keep NULL
    payload columns (left-outer as-of semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in by and c != on]

    carried = {c: f"{c}{suffix}" if c in left.columns else c for c in right_payload}
    carried[on] = f"{on}{suffix}"

    l_tagged = left.withColumn(_TAG, F.lit(1))
    for src, dst in carried.items():
        l_tagged = l_tagged.withColumn(dst, F.lit(None).cast(right.schema[src].dataType))

    r_tagged = right.select(
        *by,
        F.col(on).alias(on),  # keep for ordering
        F.lit(0).alias(_TAG),
        *[F.col(src).alias(dst) for src, dst in carried.items()],
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    on_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(on_order, F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for dst in carried.values():
        unioned = unioned.withColumn(dst, F.last(dst, ignorenulls=True).over(w))

    return unioned.where(F.col(_TAG) == 1).drop(_TAG)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_payload: list[str] | None = None,
    suffix: str = "_near",
) -> DataFrame:
    """pandas ``merge_asof(direction="nearest")``: for every left row,
    the right row in the same ``by`` group with the SMALLEST absolute
    ``on`` distance — ties (equidistant before/after) prefer the
    backward match, pandas' convention. Completes the as-of family
    (backward/forward above).

    Built as backward + forward passes (each the proven single-shuffle
    union+window plan) over payload columns pre-aliased ``_bwd``/
    ``_fwd``, then a codegen row-local pick by absolute distance — two
    shuffles total, both keyed on ``by``, no join of left against the
    full right group (the naive nearest formulation is a per-group
    cross join).

    Distances compare as day-time INTERVALS (timestamp subtraction) —
    exact microsecond integers under the hood on both engines, so the
    pick is engine-deterministic.
    """
    by_l = [by] if isinstance(by, str) else list(by)
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in by_l and c != on
        ]
    rb = right.select(
        *by_l, on, *[F.col(c).alias(f"{c}_bwd") for c in right_payload]
    )
    rf = right.select(
        *by_l, on, *[F.col(c).alias(f"{c}_fwd") for c in right_payload]
    )
    step = asof_join(
        left, rb, on, by_l,
        [f"{c}_bwd" for c in right_payload],
        suffix="_bwd", direction="backward",
    )
    step = asof_join(
        step, rf, on, by_l,
        [f"{c}_fwd" for c in right_payload],
        suffix="_fwd", direction="forward",
    )
    ts_b, ts_f = F.col(f"{on}_bwd"), F.col(f"{on}_fwd")
    t = F.col(on)
    # timestamp subtraction yields a DayTimeInterval; interval
    # comparison is exact at microsecond resolution on both engines
    take_b = ts_b.isNotNull() & (ts_f.isNull() | ((t - ts_b) <= (ts_f - t)))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(
        F.when(take_b, ts_b).otherwise(ts_f).alias(f"{on}{suffix}")
    )
    for c in right_payload:
        out_cols.append(
            F.when(take_b, F.col(f"{c}_bwd"))
            .otherwise(F.col(f"{c}_fwd"))
            .alias(f"{c}{suffix}")
        )
    return step.select(*out_cols)
