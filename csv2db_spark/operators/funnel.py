"""Ordered-sequence event analytics: funnel progression and cohort
retention — the two standard questions asked of any event stream
("how many users reach each step, in order?" / "how many users from
cohort X are still active N months later?").

Both are pure DataFrame compositions (filtered aggregates + keyed
joins / date-truncated aggregates) — no sequence UDF, no per-user
collect. The reference has no event analytics at all (SURVEY.md §2.2).

Scale shapes:
- funnel: one filtered min-agg per stage plus one user-keyed join per
  stage transition — k-1 co-partitioned shuffles for a k-step funnel,
  each carrying one row per user still in the funnel (monotonically
  shrinking). The fact table is scanned once per stage WITH the stage
  predicate pushed to the scan; at 100 TB the event-type filter prunes
  row groups before any shuffle.
- cohort retention: two aggregates over (user, month) — both shuffle on
  user_id/cohort keys that Spark map-side combines; the output matrix is
  |cohorts| × |horizon| rows, tiny by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user counts for stage i+1 only with an
    event of that type STRICTLY AFTER their stage-i entry time (first
    qualifying occurrence, the standard first-touch funnel).

    Returns (stage, stage_idx, n_users), one row per stage.
    """
    if not stages:
        raise ValueError("funnel_stages: need at least one stage")
    counts = []
    reached: DataFrame | None = None  # (user, entry ts of previous stage)
    for i, stage in enumerate(stages):
        ev = events.where(F.col(type_col) == stage).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is None:
            reached = ev.groupBy("u").agg(F.min("t").alias("entry"))
        else:
            reached = (
                ev.join(reached, ev.u == reached.u)
                .where(F.col("t") > F.col("entry"))
                .select(ev.u.alias("u2"), "t")
                .groupBy("u2")
                .agg(F.min("t").alias("entry"))
                .withColumnRenamed("u2", "u")
            )
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(stage).alias("stage"),
                F.lit(i + 1).cast("int").alias("stage_idx"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
) -> DataFrame:
    """Cohort retention matrix: cohort = day (or month) of the user's
    first event; one output row per (cohort_period, periods_since) with
    the count of distinct users from that cohort active in that period.

    ``periods_since`` is pure integer arithmetic — datediff for days,
    explicit year/month arithmetic for months (months_between is
    fractional) — so both engines compute the identical integer.
    """
    if period not in ("day", "month"):
        raise ValueError(f"period must be 'day' or 'month', got {period!r}")
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("m0")
    )
    act = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).alias("m"),
    ).distinct()
    if period == "day":
        periods_since = F.datediff(F.col("m"), F.col("m0")).cast("long")
    else:
        periods_since = (
            (F.year("m") - F.year("m0")) * 12 + (F.month("m") - F.month("m0"))
        ).cast("long")
    return (
        act.join(first, "u")
        .groupBy(
            F.col("m0").alias("cohort_period"),
            periods_since.alias("periods_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts and probabilities between
    consecutive states of each key's event sequence — the path-analysis
    complement of ``funnel_stages`` (which checks ONE ordered pattern;
    this measures ALL observed next-step behavior).

    Output: (from_state, to_state, n_transitions, p_transition) where p
    is n / total transitions leaving from_state — one integer division
    per row, bit-identical on any engine.

    Scale shape: one sort-shuffle on the key to sequence events (lead
    over (ts, id)), then a hash aggregation on the (from, to) pair —
    cardinality |states|², tiny regardless of corpus size — and a
    |states|-row window for the denominators. The per-key sort is the
    irreducible cost of sequencing; everything after is bounded."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wtot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wtot).cast("double")
        ).alias("p_transition"),
    )


def top_paths(
    events: DataFrame,
    length: int = 3,
    k: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Most-frequent length-``length`` event paths across all key
    sequences — the sequence-mining sibling of ``transition_matrix``
    (which is the length-2 special case as probabilities): which full
    journeys dominate, not just which single step follows which.

    Returns the top-``k`` (step_1..step_N, n_paths) rows, most frequent
    first with a full lexicographic tie-break — deterministic.

    Scale shape: the same single per-key sort every sequencing op here
    shares (all ``lead`` offsets evaluate in one window pass), then a
    hash aggregation whose cardinality is bounded by |states|^length —
    tiny for real event vocabularies — and a top-k over those counts.
    The corpus shuffles once."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    steps = [
        F.lead(state_col, i).over(w).alias(f"step_{i + 1}")
        for i in range(length)
    ]
    paths = events.select(*steps).where(
        F.col(f"step_{length}").isNotNull()
    )
    counted = paths.groupBy(*[f"step_{i + 1}" for i in range(length)]).agg(
        F.count(F.lit(1)).alias("n_paths")
    )
    order = [F.col("n_paths").desc()] + [
        F.col(f"step_{i + 1}") for i in range(length)
    ]
    return counted.orderBy(*order).limit(k)


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_hours: int = 168,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Marketing-style last-touch attribution: credit each conversion to
    the user's most recent STRICTLY-PRECEDING touch event within the
    lookback window. Returns one row per attributed conversion:
    (key, conversion_id, conversion_ts, touch_id, touch_type,
    seconds_since_touch); conversions with no in-window touch are
    omitted (unattributed).

    The carried "last touch" is a struct over an UNBOUNDED PRECEDING →
    1 PRECEDING row frame with ignorenulls — one window evaluation, no
    self-join of conversions against touches (the naive formulation is
    an interval join; the running-state form is linear). Strict
    preceding means a same-row conversion never attributes to itself
    even if its type were also a touch type.

    Timestamps are NTZ and the age is integer seconds via timestampdiff
    — TZ-free, hash-exact. Scale shape: the single per-key sort every
    sequencing op shares; state per row is one struct."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(state_col).isin(*touch_types),
        F.struct(
            F.col(ts_col).alias("t_ts"),
            F.col(id_col).alias("t_id"),
            F.col(state_col).alias("t_type"),
        ),
    )
    carried = events.withColumn("_lt", F.last(touch, ignorenulls=True).over(w))
    age = F.expr(f"timestampdiff(SECOND, _lt.t_ts, {ts_col})")
    return (
        carried.where(
            (F.col(state_col) == conversion_type)
            & F.col("_lt").isNotNull()
            & (age <= lookback_hours * 3600)
        )
        .select(
            key_col,
            F.col(id_col).alias("conversion_id"),
            F.col(ts_col).alias("conversion_ts"),
            F.col("_lt.t_id").alias("touch_id"),
            F.col("_lt.t_type").alias("touch_type"),
            age.alias("seconds_since_touch"),
        )
    )


def funnel_stages_windowed(
    events: DataFrame,
    stages: Sequence[str],
    max_gap_hours: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion-window funnel — the product-analytics variant of
    ``funnel_stages``: a user advances to stage i+1 only with a
    qualifying event strictly after their stage-i entry AND within
    ``max_gap_hours`` of it (Amplitude/Mixpanel's per-step conversion
    window; without it, a purchase three months after a click still
    'converts'). First qualifying occurrence advances, same first-touch
    semantics.

    Same scale shape as the strict funnel: per stage, one filtered scan
    of the event stream joined to the shrinking reached-set on user —
    the reached-set only ever loses users stage over stage, so joins
    get cheaper as the funnel deepens; no per-user event collection
    anywhere. The gap test is NTZ interval arithmetic (TZ-free)."""
    if not stages:
        raise ValueError("funnel_stages_windowed: need at least one stage")
    gap = F.make_interval(hours=F.lit(max_gap_hours))
    counts = []
    reached: DataFrame | None = None
    for i, stage in enumerate(stages):
        ev = events.where(F.col(type_col) == stage).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is None:
            reached = ev.groupBy("u").agg(F.min("t").alias("entry"))
        else:
            reached = (
                ev.join(reached, ev.u == reached.u)
                .where(
                    (F.col("t") > F.col("entry"))
                    & (F.col("t") <= F.col("entry") + gap)
                )
                .select(ev.u.alias("u2"), "t")
                .groupBy("u2")
                .agg(F.min("t").alias("entry"))
                .withColumnRenamed("u2", "u")
            )
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(stage).alias("stage"),
                F.lit(i + 1).cast("int").alias("stage_idx"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
