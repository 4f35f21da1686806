"""Count-min sketch built from relational primitives.

Spark ships a binary `count_min_sketch` aggregate, but its serialized
form can't be cross-checked against another engine. This construction
keeps the sketch RELATIONAL — the (row, bucket) -> count grid is a
plain aggregate output — so the DuckDB oracle can rebuild it
bit-for-bit, and downstream point queries are ordinary min-over-rows
lookups.

Hashing mirrors the MinHash discipline (llm/dedup.py): one md5 per
item split into two 48-bit halves, then Kirsch-Mitzenmacher double
hashing h1 + j*h2 derives all d row-hashes — portable to any engine
with md5.

Scale shape: building the sketch is one explode(d) + groupBy((j,
bucket)) — a d-times-item-count map side combining into d*w cells, so
the shuffle carries at most d*w rows per partition regardless of input
size. Point estimates join the QUERY set (small, broadcast) against the
d*w-cell sketch (also broadcast-size): no corpus re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_P = (1 << 48) - 59  # same 48-bit Mersenne-ish prime as MinHash


def countmin_build(
    items: DataFrame, item_col: str = "item", d: int = 4, w: int = 256
) -> DataFrame:
    """(j, bucket, cnt) cells of a d x w count-min sketch over
    ``items`` (one row per occurrence; pre-aggregate upstream to weight)."""
    hashed = items.select(
        F.conv(F.substring(F.md5(item_col), 1, 12), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5(item_col), 13, 12), 16, 10)
        .cast("long")
        .alias("h2"),
    )
    rows = hashed.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"), "h1", "h2"
    )
    return (
        rows.select(
            "j",
            (
                ((F.col("h1") + F.col("j") * F.col("h2")) % CMS_P) % w
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str = "item",
    d: int = 4, w: int = 256,
) -> DataFrame:
    """Point estimates: min over the d cells each probe item maps to."""
    h = probes.select(
        item_col,
        F.conv(F.substring(F.md5(item_col), 1, 12), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5(item_col), 13, 12), 16, 10)
        .cast("long")
        .alias("h2"),
    ).select(
        item_col,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
        "h1",
        "h2",
    ).select(
        item_col,
        "j",
        (((F.col("h1") + F.col("j") * F.col("h2")) % CMS_P) % w).alias(
            "bucket"
        ),
    )
    return (
        h.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def approx_top_k(
    items: DataFrame, item_col: str = "item", k: int = 10,
    d: int = 4, w: int = 256,
) -> DataFrame:
    """Approximate heavy hitters: the k most frequent items by count-min
    estimate, ties broken by item ascending — a total order, so the
    result is deterministic and hash-checkable (the DuckDB oracle
    rebuilds the identical sketch).

    Estimates are upper bounds (est >= true count always; equality when
    none of an item's d cells collide), so every TRUE heavy hitter is in
    the candidate ranking — count-min can promote a light item, never
    demote a heavy one.

    Scale shape: the sketch build shuffles at most d*w combined cells
    per partition regardless of corpus size; the candidate pass is one
    map-side-combined groupBy(item) to get distinct items, a broadcast
    join against the d*w-cell sketch, and a TakeOrdered top-k (per
    partition heap + k-row driver merge — never a global sort). For a
    vocabulary too large even for the distinct pass, feed ``items``
    pre-filtered by a cheap threshold; the sketch itself never grows.
    """
    sketch = countmin_build(items, item_col, d=d, w=w)
    distinct = items.select(item_col).distinct()
    est = countmin_estimate(sketch, distinct, item_col, d=d, w=w)
    return est.orderBy(
        F.col("est_count").desc(), F.col(item_col).asc()
    ).limit(k)


# ---------------------------------------------------------- HyperLogLog

HLL_M = 64  # registers (m); relative error ~ 1.04/sqrt(m) ~ 13%
HLL_REG_BITS = 6
HLL_WBITS = 42  # 48-bit md5 half minus the register index bits
HLL_ALPHA = 0.709  # alpha_64 from the HLL paper


def hll_distinct(
    items: DataFrame,
    item_col: str = "item",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Relational HyperLogLog distinct estimate — same discipline as the
    count-min build above: Spark ships `approx_count_distinct`, but its
    HLL++ register blob can't be cross-checked by another engine. This
    construction keeps every step relational (md5 -> register index +
    leading-zero rank -> per-register MAX -> one closed-form estimate),
    so a DuckDB oracle rebuilds the IDENTICAL registers and the
    estimate hash-matches bit-for-bit — an approximate aggregate with
    an EXACT gate.

    Math: h = 48-bit md5 half; j = h mod 64 picks the register; rho =
    43 - bitlen(h div 64) is the leading-zero rank of the remaining 42
    bits (rho = 43 for w = 0). The raw HLL estimator
    alpha*m^2 / sum(2^-M_j) is computed overflow- and rounding-free by
    multiplying through by 2^43: S = sum over registers of 2^(43-M_j)
    (absent registers contribute 2^43) is an exact BIGINT <= 2^49, and
    the estimate is ONE double division of exactly-representable
    operands — no float accumulation anywhere. The small-range
    bias correction (m*ln(m/V)) is deliberately omitted: ln() differs
    across libm builds; the raw estimator is the deterministic
    contract, and callers needing corrected estimates apply it to the
    returned n_registers/estimate pair.

    Returns (group_cols..., n_registers, est_distinct). Scale shape:
    one groupBy((group, j)) with map-side combine — the shuffle carries
    at most 64 rows per group per partition — then a 64-row-per-group
    fold. This is the mergeable-sketch pattern: register tables from
    disjoint corpus shards merge by MAX."""
    return hll_estimate_from_registers(
        hll_registers(items, item_col, group_cols), group_cols
    )


def hll_registers(
    items: DataFrame,
    item_col: str = "item",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The mergeable state of ``hll_distinct``: the (group_cols..., _j,
    m_j) register table. Register tables from disjoint shards — or
    stream micro-batches — merge by per-(group, _j) MAX, which is
    exactly what ``operators/merge.merge_aggregates(maxs=["m_j"])`` and
    the streaming rollup fold perform; estimate the merged table with
    ``hll_estimate_from_registers``."""
    group_cols = list(group_cols or [])
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    rho = F.when(F.col("_w") == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.expr("bin(_w)"))
    )
    prepared = items.select(
        *group_cols,
        (h % HLL_M).alias("_j"),
        F.shiftright(h, HLL_REG_BITS).alias("_w"),
    ).select(*group_cols, "_j", rho.alias("_rho"))
    return prepared.groupBy(*group_cols, "_j").agg(F.max("_rho").alias("m_j"))


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Closed-form raw HLL estimate from a register table (see
    ``hll_distinct`` for the math and determinism contract)."""
    group_cols = list(group_cols or [])
    two43 = 1 << (HLL_WBITS + 1)
    s = regs.groupBy(*group_cols).agg(
        (
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_WBITS + 1} - m_j AS INT))"
                )
            )
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(two43)
        ).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("n_registers"),
    )
    numerator = (F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M))) * F.lit(
        float(two43)
    )
    return s.select(
        *group_cols,
        "n_registers",
        (numerator / F.col("_s")).alias("est_distinct"),
    )


def countmin_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, d: int = 4
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built
    on the SAME (d, w, hashing) layout over each side's join key: for
    each row j, the inner product sum_b cnt_a(j,b)*cnt_b(j,b) is an
    upper bound on |A join B| (collisions only add), and the minimum
    over the d rows is the classic count-min join-size estimator
    (AMS/count-min literature) — what a cost-based planner uses to pick
    join order and broadcast sides WITHOUT scanning either table again.

    Every quantity is an exact integer (products summed as
    DECIMAL(38,0): w cells of up to corpus-squared products stay inside
    precision 38 for any realistic table), so the estimate — returned
    as (est_join_size,) one-row DataFrame — is engine-exact and
    hash-checkable, unlike real planners' float stats.

    Scale shape: both sketches are d*w rows; the join/aggregate here
    touches sketch cells only, never the tables.
    """
    a = sketch_a.select("j", "bucket", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("j", "bucket", F.col("cnt").alias("cnt_b"))
    per_row = (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(
            F.sum(
                F.col("cnt_a").cast("decimal(38,0)") * F.col("cnt_b")
            ).alias("ip")
        )
    )
    # an empty sketch side (or no shared cells) leaves zero per-row
    # inner products: the join size estimate is then 0, not NULL —
    # same empty-input discipline as hll_set_estimates
    return per_row.agg(
        F.coalesce(
            F.min("ip").cast("decimal(38,0)").cast("long"), F.lit(0).cast("long")
        ).alias("est_join_size")
    )


def hll_set_estimates(
    a: DataFrame,
    b: DataFrame,
    item_col: str = "item",
) -> DataFrame:
    """Distinct-cardinality estimates for two item sets AND their union /
    intersection from HyperLogLog registers alone — the sketch-algebra
    trick that makes distinct set arithmetic free at 100 TB: registers
    of disjoint (or overlapping) corpus shards merge by per-register
    MAX, so |A ∪ B| needs no re-scan of either side, and |A ∩ B| follows
    by inclusion-exclusion (est_a + est_b - est_union; can go negative
    within sketch error for near-disjoint sets — returned raw, callers
    clamp). Exactly the register recipe of ``hll_distinct`` (same md5 /
    rank / closed-form raw estimator), so every output bit is
    reproducible by the DuckDB oracle.

    Returns ONE row: (est_a, est_b, est_union, est_intersection).

    Scale shape: each side is one 64-register aggregation (map-side
    combined, ≤64 rows per task in the shuffle); the merge is a 128-row
    groupBy. Nothing downstream of the register build touches data."""
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    rho = F.when(F.col("_w") == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.expr("bin(_w)"))
    )

    def regs(items: DataFrame, tag: str) -> DataFrame:
        return (
            items.select(
                (h % HLL_M).alias("_j"),
                F.shiftright(h, HLL_REG_BITS).alias("_w"),
            )
            .select("_j", rho.alias("_rho"))
            .groupBy("_j")
            .agg(F.max("_rho").alias("m_j"))
            .withColumn("side", F.lit(tag))
        )

    both = regs(a, "a").unionByName(regs(b, "b"))
    two43 = 1 << (HLL_WBITS + 1)
    numerator = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(float(two43))

    def estimate(grouped: DataFrame) -> DataFrame:
        # grouped: (m_j rows) -> one 1-row/1-col estimate frame. The
        # register sum is coalesced to 0 so an EMPTY input set yields
        # _s = 64·2^43 (all registers at rho=0) and a ~0 raw estimate
        # instead of NULL propagating through every output column.
        s = grouped.agg(
            (
                F.coalesce(
                    F.sum(
                        F.expr(
                            f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_WBITS + 1} - m_j AS INT))"
                        )
                    ),
                    F.lit(0).cast("long"),
                )
                + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(two43)
            ).alias("_s")
        )
        return s.select((numerator / F.col("_s")).alias("est"))

    est_a = estimate(both.where(F.col("side") == "a"))
    est_b = estimate(both.where(F.col("side") == "b"))
    est_u = estimate(both.groupBy("_j").agg(F.max("m_j").alias("m_j")))
    out = (
        est_a.select(F.col("est").alias("est_a"))
        .crossJoin(est_b.select(F.col("est").alias("est_b")))
        .crossJoin(est_u.select(F.col("est").alias("est_union")))
    )
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_intersection"
        ),
    )
