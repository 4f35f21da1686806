"""Skew-aware join: explicit key salting.

AQE's runtime skew-join splitting (enabled in session.py) covers most
skew; explicit salting is the tool when one key dominates so heavily
that even split shuffle blocks overwhelm a task, or when AQE is off
(streaming joins, some serverless runtimes). Technique:

- big side: append a uniform random-ish salt in [0, salt) derived
  deterministically from a row id (keeps tests reproducible);
- small side: replicate each row once per salt value (explode);
- join on (key, salt) → the hot key's rows spread across ``salt``
  shuffle partitions instead of one.

Output is IDENTICAL to the unsalted join (the oracle checks exactly
that) for the supported join types, only the physical distribution
changes — so the gate query's hash-match proves the rewrite is
semantics-preserving. Right/full outer joins are REJECTED: the small
side is replicated once per salt value, so each unmatched small-side
row would surface ``salt`` times instead of once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    salt_src: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted into
    ``salt`` sub-keys. ``salt_src``: any column expression with good
    per-row dispersion (defaults to a hash of all big-side columns).

    ``how`` must keep the big side on the preserved side: inner, left
    (outer), left_semi, left_anti. Right/full outer would emit each
    unmatched small-side row once per salt replica — not the unsalted
    result — so they raise."""
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the salt-replicated "
            "small side would duplicate its unmatched rows under "
            "right/full outer joins; use inner/left/left_semi/left_anti"
        )
    if salt_src is None:
        salt_src = F.hash(*[F.col(c) for c in big.columns])
    b = big.withColumn("_salt", F.pmod(salt_src, F.lit(salt)))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Key-distribution diagnostic: the top-N heaviest keys with their
    row share and the multiple of the mean group size — the measurement
    that decides WHETHER ``salted_join``'s treatment (above) is needed
    and how many salts to use. A key at 1000× the mean group size is a
    straggler task at 100 TB; this report finds it for the cost of one
    aggregation.

    Returns (key_cols..., n_rows, share, x_mean) for the N heaviest
    keys, heaviest first (ties broken on the key for determinism).
    share = n_key/n_total and x_mean = n_key·n_groups/n_total are exact
    integer ratios — one IEEE division each, hash-checkable.

    Scale shape: one map-combined groupBy on the key (the shuffle
    carries one partial count per key per task), a 1-row total fold
    broadcast back, and a top-N sort over |keys| count rows — never row
    data. This is the cheap pre-flight before any big join or agg."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = F.broadcast(
        counts.agg(
            F.sum("n_rows").alias("_total"),
            F.count(F.lit(1)).alias("_groups"),
        )
    )
    return (
        counts.crossJoin(totals)
        .select(
            *key_cols,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
            (
                (F.col("n_rows") * F.col("_groups")).cast("double")
                / F.col("_total").cast("double")
            ).alias("x_mean"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_n)
    )
