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
that), only the physical distribution changes — so the gate query's
hash-match proves the rewrite is semantics-preserving.
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
    per-row dispersion (defaults to a hash of all big-side columns)."""
    if salt_src is None:
        salt_src = F.hash(*[F.col(c) for c in big.columns])
    b = big.withColumn("_salt", F.pmod(salt_src, F.lit(salt)))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")
