"""Product-quantization ANN (Jégou et al. 2011, "Product quantization
for nearest neighbor search"): split each vector into M subvectors,
quantize each against a per-subspace codebook of K codewords, and score
candidates by Asymmetric Distance Computation — the query stays exact,
corpus vectors are replaced by M one-byte codes.

Why this matters at 100 TB: a 64-dim float corpus is 256 bytes/vector;
PQ codes are M=8 bytes — a 32× compression that turns a memory-bound
scan into one that fits executor RAM, which is the difference between
an ANN sweep running in-core or spilling. The LSH and IVF variants
(llm/similarity.py) bound the CANDIDATE COUNT; PQ bounds the BYTES PER
CANDIDATE — production systems (FAISS IVF-PQ) compose both, and this
module composes with ivf the same way (encode within cells).

Determinism: everything is exact integer arithmetic in the 1e-8
quantized domain of llm/similarity.py — codebooks are the K lowest-id
vectors' subvectors refined by one exact-integer Lloyd step (ties to
the lower code id), encoding is exact-integer argmin, and ADC distances
are exact long sums of table entries, so results are bit-reproducible
at any partitioning (pinned by tests). The gate is rows-only like the
other ANN gates: PQ is approximate BY DESIGN vs the exact baseline;
recall bounds live in tests/test_analytics2.py.

Scale shape: codebook train/refine touches only K·M rows of seed state
plus one broadcast-join pass; encoding is a map-only broadcast join
(corpus never shuffles); ADC explodes codes to (vec, m) — M rows per
vector — joins the broadcast 128-entry distance table, and folds back
on vec_id: ONE code-keyed shuffle of M·n skinny rows, no float math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csv2db_spark.llm.similarity import quantize


def _subvectors(df: DataFrame, id_alias: str, m: int, sub: int) -> DataFrame:
    """(id, m, sub_iv): split the quantized int vector into M slices."""
    return df.select(
        id_alias,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("m"),
                        F.slice(F.col("x_iv"), i * sub + 1, sub).alias("sub_iv"),
                    )
                    for i in range(m)
                ]
            )
        ).alias("_s"),
    ).select(id_alias, F.col("_s.m").alias("m"), F.col("_s.sub_iv").alias("sub_iv"))


def _d2(a, b):
    """Exact integer squared distance between two int-vector slices."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Per-subspace codebooks: the K lowest-id vectors seed each
    subspace, then ONE exact-integer Lloyd step refines them (mean of
    assigned subvectors, floor division — empty cells keep their seed).
    Returns (m, code, code_iv). Deterministic end to end."""
    sub = dim // m
    q = quantize(corpus, id_col, vec_col, "_vid", "x_")
    seeds = (
        _subvectors(q.where(F.col("_vid") < k), "_vid", m, sub)
        .select("m", F.col("_vid").cast("int").alias("code"), F.col("sub_iv").alias("code_iv"))
    )
    subs = _subvectors(q, "_vid", m, sub)
    asn = (
        subs.join(F.broadcast(seeds), "m")
        .select("_vid", "m", "code", "sub_iv", _d2(F.col("sub_iv"), F.col("code_iv")).alias("_d2"))
    )
    w = Window.partitionBy("_vid", "m").orderBy("_d2", "code")
    assigned = asn.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    # one Lloyd step: exact-integer mean per (m, code, dim-position)
    el = assigned.select(
        "m", "code", F.posexplode("sub_iv").alias("pos", "v")
    )
    means = el.groupBy("m", "code", "pos").agg(
        F.expr("div(sum(v), count(1))").alias("mv")
    )
    refined = (
        means.groupBy("m", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("_ps"))
        .select(
            "m",
            "code",
            F.transform(F.col("_ps"), lambda s: s.getField("mv")).alias("code_iv"),
        )
    )
    # empty cells (no assignment) keep their seed
    return (
        seeds.alias("s")
        .join(refined.alias("r"), ["m", "code"], "left")
        .select(
            "m",
            "code",
            F.coalesce(F.col("r.code_iv"), F.col("s.code_iv")).alias("code_iv"),
        )
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Encode every vector as M code ids (nearest codeword per subspace,
    exact-integer argmin, ties to the lower code). Map-only: the
    codebook (M·K rows) is broadcast; the corpus never shuffles.
    Returns (id, m, code) — M skinny rows per vector, the 32×-compressed
    representation downstream ADC scans instead of the floats."""
    sub = dim // m
    q = quantize(corpus, id_col, vec_col, "_vid", "x_")
    subs = _subvectors(q, "_vid", m, sub)
    scored = subs.join(F.broadcast(codebook), "m").select(
        "_vid", "m", "code", _d2(F.col("sub_iv"), F.col("code_iv")).alias("_d2")
    )
    w = Window.partitionBy("_vid", "m").orderBy("_d2", "code")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("_vid").alias(id_col), "m", "code")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """ADC top-k: per query, build the M×K exact-integer distance table
    (query subvector vs every codeword — 128 entries, broadcast), then
    score every encoded corpus vector as the SUM of its M table lookups
    (exact long adds, no float), and keep the k best (ties to lower id).

    Returns (query_id, neighbor_id, approx_d2, rank). Self-matches are
    excluded to mirror llm/similarity.cosine_topk's contract."""
    sub = dim // m
    codebook = pq_codebook(corpus, id_col, vec_col, m, n_codes, dim)
    codes = pq_encode(corpus, codebook, id_col, vec_col, m, dim)
    qq = quantize(queries, id_col, vec_col, "query_id", "q_").select(
        "query_id", F.col("q_iv")
    )
    qsubs = qq.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("m"),
                        F.slice(F.col("q_iv"), i * sub + 1, sub).alias("sub_iv"),
                    )
                    for i in range(m)
                ]
            )
        ).alias("_s"),
    ).select("query_id", F.col("_s.m").alias("m"), F.col("_s.sub_iv").alias("sub_iv"))
    dtable = qsubs.join(F.broadcast(codebook), "m").select(
        "query_id", "m", "code", _d2(F.col("sub_iv"), F.col("code_iv")).alias("d2")
    )
    scored = (
        codes.join(F.broadcast(dtable), ["m", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("d2").alias("approx_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("approx_d2", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "approx_d2", "rank"
        )
    )
