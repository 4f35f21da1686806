"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
semantic (embedding-cosine) ranking — the standard RAG retrieval stack
(Cormack et al. 2009's RRF), expressed as a join of two small ranked
lists.

Why RRF and not score mixing: BM25 scores and cosine similarities live on
incomparable scales; RRF uses only the RANKS — score = Σ 1/(k0 + rank)
over the lists that retrieved the document — which makes fusion
scale-free AND hash-verifiable: ranks are exact integers (both underlying
rankings are bit-deterministic here), so each term is one IEEE division
and the sum has a fixed two-term order.

Scale shape (100 TB): the corpus-sized work happens inside the two
retrievers (each linear, see llm/text.bm25_topk and
llm/similarity.cosine_topk); fusion itself joins two ≤n_candidates-row
lists — driver-trivial, executed as a broadcast full-outer join.

Reference parity note: and-hom/csv2db has no retrieval surface
(SURVEY.md §2.2); this extends the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Fuse two ranked candidate lists by reciprocal-rank fusion.

    Inputs are (id, rank) frames with 1-based ranks. A document absent
    from one list contributes nothing for that list (the standard RRF
    convention). Returns the top-``k`` fused rows as
    (id, rank_lex, rank_sem, rrf_score), score-descending with id
    tiebreak. ``k0`` damps the head of each list (60 per the paper).

    Determinism: rrf_score = coalesce(1/(k0+ra), 0) + coalesce(
    1/(k0+rb), 0) — two IEEE divisions of exact integers added in fixed
    order, bit-identical on any engine."""
    a = ranked_a.select(
        F.col(id_col).alias("_id"), F.col(rank_col).alias("rank_lex")
    )
    b = ranked_b.select(
        F.col(id_col).alias("_id"), F.col(rank_col).alias("rank_sem")
    )
    fused = a.join(b, "_id", "full_outer").select(
        F.col("_id").alias(id_col),
        "rank_lex",
        "rank_sem",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("rank_lex")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("rank_sem")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)


def retrieval_metrics(
    ranked: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Ranking-quality evaluation: per query, recall@k and MRR@k of a
    ranked candidate list against a relevance set — the measurement leg
    of the retrieval stack (rrf_fuse and the ANN operators produce
    ``ranked``; the exact brute-force top-k is the natural ``truth``).

    Metrics are chosen to be hash-exact: recall = hits/|truth| and
    MRR = 1/first_hit_rank are single IEEE divisions of exact integers
    (nDCG's log2 discount would not cross engines bit-identically —
    same rationale as the rational-idf BM25). Queries with no hit in
    the top-k get MRR 0; queries present in truth but absent from
    ``ranked`` still appear (left join from the truth side).

    Scale shape: one equi-join on (query, doc) — both inputs are
    ranked lists, k rows per query, never corpus-sized — then a
    |queries|-row aggregate."""
    t = truth.select(
        F.col(query_col).alias("_q"), F.col(doc_col).alias("_d")
    )
    r = ranked.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_rank"),
    )
    joined = t.join(r, ["_q", "_d"], "left")
    return joined.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).alias("n_relevant"),
        F.count("_rank").alias("n_hits"),
        (
            F.count("_rank").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("recall_at_k"),
        F.coalesce(
            F.lit(1.0) / F.min("_rank").cast("double"), F.lit(0.0)
        ).alias("mrr_at_k"),
    )


def mmr_rerank(
    corpus: DataFrame,
    query_id: int,
    n_shortlist: int = 24,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998): rerank an exact-cosine shortlist so each pick balances
    relevance to the query against redundancy with what is already
    selected — score = λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), greedy,
    λ = 1/2. The standard RAG/context-assembly step after retrieval:
    top-k BY relevance alone returns near-duplicates; MMR spends the
    budget on coverage.

    Hash-exactness: relevance and pairwise similarities are the engine's
    quantized-integer cosines (llm/similarity: exact long dots at scale
    1e16, then fixed-order IEEE division/sqrt — bit-identical across
    engines); λ = 1/2 makes λ·rel an EXACT halving (power of two), so
    the greedy argmax (ties → smaller id) is fully deterministic and the
    oracle unrolls the same greedy as k chained SQL steps.

    Scale shape (100 TB): the corpus-sized work is the shortlist — one
    distributed exact-cosine pass (or any ANN operator upstream). The
    greedy itself is inherently sequential in k, so it runs driver-side
    over the COLLECTED shortlist: O(n_shortlist·k·dim) on ≤ n_shortlist
    rows — the same bounded-driver tier as PCA's dim×dim eigh. Nothing
    corpus-sized ever reaches the driver.
    """
    import math

    from csv2db_spark.llm.similarity import QUANT_SQ, cosine_topk, quantize

    spark = corpus.sparkSession
    qdf = corpus.where(F.col(id_col) == query_id)
    short = cosine_topk(
        corpus, qdf, k=n_shortlist, id_col=id_col, vec_col=vec_col
    )
    cq = quantize(corpus, id_col, vec_col, "neighbor_id", "c_")
    rows = (
        short.join(cq, "neighbor_id")
        .select("neighbor_id", "cos_sim", "c_iv", "c_nrm2")
        .collect()
    )
    cands = {
        int(r["neighbor_id"]): (
            float(r["cos_sim"]),
            [int(x) for x in r["c_iv"]],
            int(r["c_nrm2"]),
        )
        for r in rows
    }

    def _cos(a_iv, a_n2, b_iv, b_n2):
        # mirrors similarity.cos_from_parts step for step: exact integer
        # dot, then int->double conversions and IEEE div/sqrt in the
        # same order as both the Spark codegen and the DuckDB oracle
        d = sum(x * y for x, y in zip(a_iv, b_iv))
        return (d / QUANT_SQ) / (
            math.sqrt(a_n2 / QUANT_SQ) * math.sqrt(b_n2 / QUANT_SQ)
        )

    selected: list[int] = []
    out = []
    remaining = dict(cands)
    while remaining and len(out) < k:
        best = None
        for nid in sorted(remaining):
            rel, iv, n2 = remaining[nid]
            pen = max(
                (
                    _cos(iv, n2, cands[s][1], cands[s][2])
                    for s in selected
                ),
                default=0.0,
            )
            score = 0.5 * rel - 0.5 * pen
            if best is None or score > best[0]:
                best = (score, nid, rel, pen)
        score, nid, rel, pen = best
        selected.append(nid)
        out.append((len(out) + 1, nid, rel, pen, score))
        del remaining[nid]
    return spark.createDataFrame(
        out,
        "rank int, neighbor_id long, relevance double,"
        " diversity_penalty double, mmr_score double",
    )
