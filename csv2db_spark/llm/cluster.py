"""K-means clustering over an ``array<float>`` embedding column,
expressed relationally — assignment and the Lloyd update are plain
joins/aggregations, so Catalyst plans them and the whole iteration is a
broadcast join + two shuffles regardless of corpus size.

This is the standalone face of the machinery ``llm/similarity.py``'s IVF
index builds on (reference has no ML surface; this is a north-star
LLM-pipeline extension: corpus clustering for mixture balancing, IVF cell
assignment, topic bucketing).

Numeric discipline: all distances are computed in the exact scaled-integer
domain of ``llm/similarity.py`` (1e-8 fixed point, long accumulation):
d²(x,c) = |x|² + |c|² − 2·x·c with every term an exact int64 — elements in
(−1, 1) quantize to <2e8, so 64-dim sums stay < 2^63. Assignment is
therefore deterministic and engine-independent (ties broken on cluster
id), and the per-dimension means — exact integer sums divided once —
hash-match an ANSI-SQL oracle bit-for-bit, which is how the driver gate
can verify an "ML" operator exactly.

Scale shape (100 TB): centroids are k rows — always broadcast; the
assignment pass is a map-only broadcast join (no corpus shuffle); the
update step shuffles (cluster_id, dim) pairs — k×dim groups, never
corpus-sized. Iterating Lloyd = re-running the same two-stage plan with
the new centroid table; each round is linear in corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csv2db_spark.llm.similarity import QUANT, dot_iv, quantize


def kmeans_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cluster_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (exact squared
    distance, ties → lowest cluster id). Returns (id, cluster_id, d2)
    with d2 at integer scale QUANT².

    ``centroids`` is any (centroid_id_col, vec_col) DataFrame — seed
    rows, a previous step's output, or externally trained centers. It is
    broadcast: the corpus never shuffles during assignment."""
    x = quantize(vectors, id_col, vec_col, id_col, "x_")
    c = quantize(centroids, centroid_id_col, vec_col, centroid_id_col, "c_")
    d2 = (
        F.col("x_nrm2") + F.col("c_nrm2") - 2 * dot_iv(F.col("x_iv"), F.col("c_iv"))
    ).alias("d2")
    scored = x.crossJoin(F.broadcast(c)).select(id_col, centroid_id_col, d2)
    w = Window.partitionBy(id_col).orderBy("d2", centroid_id_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def kmeans_step(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration: assign, then per-(cluster, dimension) exact
    mean. Returns (cluster_id, dim, n_members, mean_el) — the new
    centroid table in long form (pivot back to arrays with
    ``F.array_agg`` when feeding the next round).

    mean_el = (Σ quantized elements as decimal(38,0) → double) / n / QUANT
    — one division at the end, bit-identical across engines."""
    asn = kmeans_assign(vectors, centroids, id_col, vec_col)
    q = quantize(vectors, id_col, vec_col, id_col, "x_")
    el = (
        q.join(asn.select(id_col, "cluster_id"), id_col)
        .select("cluster_id", F.posexplode("x_iv").alias("dim", "q"))
    )
    return el.groupBy("cluster_id", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        (
            F.sum(F.col("q").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(float(QUANT))
        ).alias("mean_el"),
    )
