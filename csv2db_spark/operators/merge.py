"""Upsert / merge-by-key.

The reference's five table modes (SURVEY.md §7.3) cover append/replace
semantics only; a real warehouse sink also needs MERGE (upsert): rows
from the change set replace same-key rows in the base, new-key rows
append, unmatched base rows survive.

Spark-first formulation: an anti-join + union —

    result = changes ∪ (base ⟕anti changes.keys)

Both legs are declarative; Catalyst broadcasts the (typically small)
change-key side of the anti-join, so the base table streams through one
scan with no shuffle of the big side. At 100 TB this is exactly the
strategy Delta/Iceberg MERGE compiles to for copy-on-write tables
(minus file-level pruning, which the table format adds on top).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert(base: DataFrame, changes: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge ``changes`` into ``base`` by ``keys``: change rows win on key
    collision, base rows survive otherwise. Columns must match."""
    if set(base.columns) != set(changes.columns):
        raise ValueError(
            f"column mismatch: base={sorted(base.columns)} "
            f"changes={sorted(changes.columns)}"
        )
    change_keys = changes.select(*keys).distinct()
    survivors = base.join(F.broadcast(change_keys), list(keys), "left_anti")
    return changes.unionByName(survivors)


def merge_aggregates(
    old_agg: DataFrame,
    new_partials: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Incremental rollup maintenance: fold a batch of new partial
    aggregates into an existing aggregate table without touching the
    history that produced it.

    The 100 TB pattern this encodes: a daily/hourly pipeline never
    re-aggregates the full fact history — it aggregates only the new
    partition (map-side, cheap) and MERGES the partials into the
    standing rollup. That works exactly when every measure is an
    algebraic aggregate (sum/count/min/max — and avg as sum+count):
    merge(sum)=sum, merge(count)=sum, merge(min)=min, merge(max)=max.
    Both inputs here carry the SAME aggregate columns; the merge is a
    unionByName + one groupBy on the rollup keys — the shuffle is over
    |old groups| + |new groups| rows, not over any fact table.

    Non-algebraic measures (exact distinct, exact median) cannot be
    maintained this way; use their sketch forms (HLL / t-digest /
    countmin in operators/sketch.py) whose merge IS algebraic.
    """
    ks = list(keys)
    both = old_agg.unionByName(new_partials)
    aggs = (
        [F.sum(c).alias(c) for c in sums]
        + [F.sum(c).alias(c) for c in counts]
        + [F.min(c).alias(c) for c in mins]
        + [F.max(c).alias(c) for c in maxs]
    )
    if not aggs:
        raise ValueError("merge_aggregates: no measure columns given")
    return both.groupBy(*ks).agg(*aggs)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """CDC-style diff of two table snapshots by key: one row per changed
    key with change_type 'insert' (key only in new), 'delete' (only in
    old), or 'update' (both, any compared column differs — NULL-safe).
    Unchanged keys are absent from the output.

    The everyday warehouse question ("what changed between yesterday's
    load and today's?") as one full outer join on the key — shuffle on
    the key both sides, the comparison runs in whole-stage codegen, and
    the output is proportional to the CHANGES, not the table. At 100 TB
    with date-partitioned snapshots the join prunes to the compared
    partitions; for continuous feeds the streaming ingest path covers
    the same need incrementally.
    """
    ks = list(keys)
    cmp_cols = [c for c in (compare or old.columns) if c not in ks]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in ks],
        *[F.col(c).alias(f"_o_{c}") for c in cmp_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in ks],
        *[F.col(c).alias(f"_n_{c}") for c in cmp_cols],
    )
    cond = None
    for k in ks:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ok_{ks[0]}").isNotNull()
    in_new = F.col(f"_nk_{ks[0]}").isNotNull()
    differs = None
    for c in cmp_cols:
        ne = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        differs = ne if differs is None else differs | ne
    change = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(~in_old & in_new, F.lit("insert"))
        .when(differs if differs is not None else F.lit(False), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in ks
            ],
            "change_type",
        )
    )


def scd2_build(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_tiebreak: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change log: one
    versioned row per (key, change), with its validity interval derived
    from the NEXT change of the same key — the warehouse-standard
    effective-dated dimension (Kimball SCD2), the historical complement
    of ``upsert`` (which keeps only the latest row).

    Output columns: key_cols..., attr_cols..., ``version`` (1-based per
    key), ``effective_from`` (this change's timestamp), ``effective_to``
    (next change's timestamp, NULL while current), ``is_current``.

    Determinism: rows are sequenced per key by (ts, tiebreak) where the
    tiebreak is a unique column — simultaneous changes get a stable
    order, so versions and intervals are engine-reproducible.

    Scale shape: ONE sort-shuffle on the key (row_number and both leads
    share the same window sort — Spark plans a single exchange+sort and
    evaluates all three in one pass). No join: the interval comes from
    lead(), not a self-join on version+1, which would double the
    shuffles and break on skewed keys."""
    from pyspark.sql import Window

    ks = list(key_cols)
    w = Window.partitionBy(*ks).orderBy(ts_col, order_tiebreak)
    return changes.select(
        *ks,
        *attr_cols,
        F.row_number().over(w).alias("version"),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w).alias("effective_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture feed (op ∈ I/U/D with a per-key
    version order) onto a base snapshot — the consumer side of Debezium
    / Delta change feeds, for plain DataFrames: the LATEST change per
    key wins (ties broken on the op so a same-version D beats the I/U
    it tombstones), D deletes the key, I/U replace the row, unchanged
    base keys pass through.

    Scale shape: one window over the CHANGE FEED per key (latest-wins
    compaction — feed-sized, not table-sized) and one full-outer join
    against the base on the key; no table rewrite beyond the join. At
    100 TB the base never shuffles more than once and partition-pruned
    storage (sink.targeted_delete / partition_append) takes over below
    this operator."""
    keys = list(keys)
    data_cols = [c for c in base.columns if c not in keys]
    # Tie-break by an explicit op RANK, not the op string: lexical desc
    # would sort 'U' > 'I' > 'D' and silently drop a same-version delete.
    op_rank = F.when(F.col(op_col) == "D", 2).otherwise(1)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), op_rank.desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", version_col)
    )
    joined = base.alias("b").join(latest.alias("c"), keys, "full_outer")
    keep_change = F.col(f"c.{op_col}").isNotNull() & (
        F.col(f"c.{op_col}") != "D"
    )
    keep_base = F.col(f"c.{op_col}").isNull()
    out_cols = [F.col(k) for k in keys] + [
        F.when(keep_change, F.col(f"c.{c}"))
        .otherwise(F.col(f"b.{c}"))
        .alias(c)
        for c in data_cols
    ]
    return joined.where(keep_change | keep_base).select(*out_cols)


def apply_retractions(
    view: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    op_col: str,
    count_alias: str = "n_rows",
    sum_cols: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Incremental view maintenance with DELETES: fold a retraction
    stream into a standing GROUP BY view without rescanning the base.

    ``view``: the materialized aggregate (keys + ``count_alias`` + the
    keys of ``sum_cols``). ``delta``: RAW rows carrying ``op_col`` =
    +1 (insert) / -1 (retract a previously-counted row), e.g. the
    before/after images of a CDC feed. ``sum_cols`` maps each measure
    alias in the view to the delta-side expression that produced it
    (an exact-decimal cast per functions/numeric.py, so the maintained
    sums stay order-independent).

    Semantics (the classical counting algorithm for IVM over
    SPJ+GROUP BY, per Gupta-Mumick's view-maintenance survey): the
    delta is pre-aggregated to per-group (Σop, Σ op·measure) partials
    — map-side combined, so the shuffle is |delta groups|, never
    |delta rows| — then one full-outer merge with the view; groups
    whose maintained count reaches 0 are DROPPED (the insert-only
    ``merge_aggregates`` above cannot express that). min/max are
    deliberately unsupported: they are not maintainable under deletes
    without the full history.

    At 100 TB the view is |groups| rows and the only scan is the
    delta batch — the whole point: cost is O(|delta| + |groups|),
    independent of the base fact table's size. Caller contract: every
    op=-1 row must replay a row the view has counted (standard IVM
    precondition); a group driven negative would indicate a corrupt
    feed and is dropped with the zeros.
    """
    ks = list(keys)
    sums = dict(sum_cols or {})
    op = F.col(op_col).cast("long")
    d = delta.groupBy(*ks).agg(
        F.sum(op).alias("_dn"),
        *[F.sum(op * expr).alias(f"_ds_{a}") for a, expr in sums.items()],
    )
    # NULL-SAFE key merge: GROUP BY treats NULL as one group, so the
    # view merge must too — a plain equi-join would split a NULL-keyed
    # group into two永 rows (view-side and delta-side) instead of folding
    v, dd = view.alias("_v"), d.alias("_d")
    cond = None
    for k in ks:
        eq = F.col(f"_v.{k}").eqNullSafe(F.col(f"_d.{k}"))
        cond = eq if cond is None else cond & eq
    merged = v.join(dd, cond, "full_outer")
    n_new = F.coalesce(F.col(f"_v.{count_alias}"), F.lit(0)) + F.coalesce(
        F.col("_d._dn"), F.lit(0)
    )
    # the delta side distinguishes "matched with NULL key" from
    # "unmatched" by _dn (never NULL on a real delta row)
    key_out = [
        F.when(F.col("_d._dn").isNotNull(), F.col(f"_d.{k}"))
        .otherwise(F.col(f"_v.{k}"))
        .alias(k)
        for k in ks
    ]
    out_cols = key_out + [n_new.alias(count_alias)]
    for a in sums:
        # NULL view-side (brand-new group) and NULL delta-side (group
        # untouched this batch) both coalesce through; decimal + decimal
        # keeps exactness end to end
        out_cols.append(
            (
                F.coalesce(F.col(f"_v.{a}"), F.lit(0))
                + F.coalesce(F.col(f"_d._ds_{a}"), F.lit(0))
            ).alias(a)
        )
    return merged.select(*out_cols).where(F.col(count_alias) > 0)


def ivm_dirty_group_refresh(
    view: DataFrame,
    base_current: DataFrame,
    changed_rows: DataFrame,
    keys: Sequence[str],
    aggregate: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """View maintenance for measures the counting algorithm CANNOT
    maintain (min/max/exact-distinct under deletes): recompute only the
    DIRTY groups — those with at least one changed row — from the
    current base, and carry every untouched group over from the standing
    view unread.

    ``aggregate`` is the view definition (raw rows → grouped aggregate
    over ``keys``); ``changed_rows`` is any frame carrying the group
    keys of this batch's inserts/updates/deletes. The dirty key set is
    small (one batch's groups), so both the semi-join that restricts the
    base scan and the anti-join that protects the standing view
    broadcast it.

    The 100 TB contract: cost is O(|rows of dirty groups| + |groups|),
    NOT O(|base|) — with the base partitioned/clustered by a key prefix
    (sink.write_partitioned / snapshot-table file stats), the semi-join
    prunes to the dirty partitions and untouched data is never read.
    This composes with ``apply_retractions``: counts/sums maintain
    algebraically from the delta alone; min/max refresh through here.
    """
    ks = list(keys)
    dirty = changed_rows.select(*ks).distinct().alias("_dirty")

    def _nullsafe(side: DataFrame, how: str) -> DataFrame:
        # GROUP BY keys may legitimately be NULL (one group); plain
        # semi/anti equi-joins would never match them, leaving a
        # NULL-keyed group permanently stale
        s = side.alias("_s")
        cond = None
        for k in ks:
            eq = F.col(f"_s.{k}").eqNullSafe(F.col(f"_dirty.{k}"))
            cond = eq if cond is None else cond & eq
        return s.join(F.broadcast(dirty), cond, how)

    recomputed = aggregate(_nullsafe(base_current, "left_semi"))
    untouched = _nullsafe(view, "left_anti")
    return untouched.unionByName(recomputed)
