"""Broadcast bitset runtime filter: prune a fact table BEFORE its join
shuffle using a compact membership filter built from the (filtered) dim
side's join keys.

Why this exists: Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) only injects when
its creation-side thresholds line up, and the underlying
``bloom_filter_agg`` expression is not registered as a public SQL
function in this build. The same effect is expressible in pure
relational ops — so the optimization is declarative, plan-visible, and
portable:

1. hash each dim key to a position in a 2^``log2m``-bit space
   (``xxhash64`` — JVM codegen, no Python);
2. fold positions into 64-bit words with ``bit_or`` — the filter
   materializes as a tiny (word_idx, bits) table of at most 2^log2m/64
   rows, built with ONE small shuffle of the already-filtered dim keys;
3. broadcast-join the words to the fact on word index and keep rows
   whose bit is set; false positives are possible (hash collisions),
   false negatives are not;
4. run the EXACT join afterwards — results are identical to the plain
   join, the bitset only removes rows that cannot match.

Scale story (100 TB fact, selective dim): the fact-side shuffle is the
dominant cost of a shuffled join; every fact row that cannot match but
still gets shuffled is pure waste. The bitset test costs one broadcast
hash join + two bitwise ops per row (whole-stage codegen, no expansion),
and drops non-matching rows at the scan stage — before any wide
exchange. With log2m=20 (1 Mbit = 16K words) and a dim selecting ~10K
keys, the false-positive rate is under 1%; tune log2m to the dim
cardinality. The reference has no join surface at all (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_bitset(dim: DataFrame, key: str, log2m: int = 20) -> DataFrame:
    """Build the (word_idx, bits) bitset table over the dim's key hashes.

    One narrow aggregation over the dim side; output is at most
    2^log2m / 64 rows of (long, long) — kilobytes, always broadcastable.
    """
    m = 1 << log2m
    pos = F.pmod(F.xxhash64(F.col(key)), F.lit(m))
    return (
        dim.select(pos.alias("_pos"))
        .groupBy((F.col("_pos") / 64).cast("long").alias("_word_idx"))
        .agg(
            # shiftleft's Python wrapper only takes a literal bit count;
            # the SQL form accepts a column
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))")
            ).alias("_bits")
        )
    )


def bitset_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    log2m: int = 20,
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with a bitset pre-prune of the fact side.

    Result rows are IDENTICAL to ``fact.join(dim, fact._key == dim._key,
    how)`` for inner/semi joins — the bitset admits false positives
    (removed by the exact join) but never false negatives. The win is
    that fact rows with no possible partner are dropped before the join
    shuffle instead of after it.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bitset prefilter preserves semantics only for inner/semi joins, got {how!r}"
        )
    m = 1 << log2m
    # Collision-free helper names: suffix until no fact column starts with
    # the prefix, so a fact that already carries _pos/_word_idx/_bits (or
    # a previous prefilter's helpers) is never silently clobbered.
    prefix = "_bsf"
    while any(c.startswith(prefix) for c in fact.columns):
        prefix += "x"
    c_pos, c_widx, c_bits = f"{prefix}_pos", f"{prefix}_word_idx", f"{prefix}_bits"
    words = F.broadcast(
        key_bitset(dim, dim_key, log2m=log2m)
        .withColumnRenamed("_word_idx", c_widx)
        .withColumnRenamed("_bits", c_bits)
    )
    pos = F.pmod(F.xxhash64(F.col(fact_key)), F.lit(m))
    pruned = (
        fact.withColumn(c_pos, pos)
        .withColumn(c_widx, (F.col(c_pos) / 64).cast("long"))
        # inner join on word index: a missing word means no dim key hashed
        # into that 64-bit span, so dropping the row is exactly right
        .join(words, c_widx)
        .where(
            F.expr(
                f"shiftrightunsigned({c_bits}, CAST({c_pos} % 64 AS INT))"
                " & CAST(1 AS BIGINT)"
            )
            == 1
        )
        .drop(c_pos, c_widx, c_bits)
    )
    # Qualified join: fact and dim commonly share the key name (both
    # 'custkey'); unqualified F.col(fact_key) == F.col(dim_key) would
    # raise AMBIGUOUS_REFERENCE in that case.
    f, d = pruned.alias("_bsf_fact"), dim.alias("_bsf_dim")
    return f.join(
        d, F.col(f"_bsf_fact.{fact_key}") == F.col(f"_bsf_dim.{dim_key}"), how
    )
