"""Record linkage / entity resolution primitives.

The standard ER recipe at scale is block -> compare -> classify; the
comparison is quadratic only WITHIN a block, so the blocking scheme is
the whole scale story. ``sorted_neighborhood_pairs`` implements the
classic sorted-neighborhood method (Hernandez & Stolfo 1995): sort by a
blocking key, compare each record to its w-1 successors — a linear
number of candidate pairs regardless of corpus size.

Distributed twist: a GLOBAL sort window would put the whole corpus in
one partition, so the sort runs inside hash-partitioned BLOCKS (key
prefix by default) — each block's window is a keyed Spark window, the
corpus never single-threads. Records whose near-duplicates differ in
the block prefix are missed (the standard multi-pass answer: run again
with a second key such as a reversed or phonetic key and union the
pairs); the in-block sorted pass is lossless for same-prefix typos.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 3,
    block: Column | None = None,
) -> DataFrame:
    """Candidate pairs within ``window`` positions of the block-sorted
    order: (id_a, id_b, key_a, key_b) with id_a < id_b. ``block``
    defaults to the key's first character. Each record meets exactly
    window-1 successors (via ``lead`` — no self-join), so candidates
    are linear in |df| and the shuffle is one keyed window per block."""
    blk = block if block is not None else F.substring(F.col(key_col), 1, 1)
    w = Window.partitionBy("_blk").orderBy("_k", "_id")
    base = df.select(
        F.col(id_col).alias("_id"), F.col(key_col).alias("_k"), blk.alias("_blk")
    )
    lagged = base.select(
        "_id",
        "_k",
        *[F.lead("_id", j).over(w).alias(f"_id{j}") for j in range(1, window)],
        *[F.lead("_k", j).over(w).alias(f"_k{j}") for j in range(1, window)],
    )
    # one struct per successor, nulls (past the block end) filtered out,
    # exploded — a union of per-offset selects would re-run the window
    # (and its sort shuffle) once per branch; this keeps ONE window pass.
    # Keys follow the id normalization so (key_a, key_b) always
    # describes (id_a, id_b).
    structs = [
        F.when(
            F.col(f"_id{j}").isNotNull(),
            F.struct(
                F.least("_id", f"_id{j}").alias("id_a"),
                F.greatest("_id", f"_id{j}").alias("id_b"),
                F.when(F.col("_id") < F.col(f"_id{j}"), F.col("_k"))
                .otherwise(F.col(f"_k{j}"))
                .alias("key_a"),
                F.when(F.col("_id") < F.col(f"_id{j}"), F.col(f"_k{j}"))
                .otherwise(F.col("_k"))
                .alias("key_b"),
            ),
        )
        for j in range(1, window)
    ]
    out = lagged.select(
        F.explode(
            F.filter(F.array(*structs), lambda x: x.isNotNull())
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.key_a", "p.key_b")
    return out.distinct()


def edit_distance_matches(
    pairs: DataFrame, max_distance: int = 2
) -> DataFrame:
    """Classify sorted-neighborhood candidates by Levenshtein distance —
    the compare step of block -> compare -> classify. Runs only on the
    (linear) candidate set, never the corpus; codegen levenshtein."""
    return pairs.select(
        "id_a",
        "id_b",
        F.levenshtein("key_a", "key_b").alias("lev"),
    ).where(F.col("lev") <= max_distance)
