"""Partition-invariance: results must be BIT-identical under any physical
distribution of the input — the property that makes the engine's answers
stable between local[32] and a 1000-executor cluster.

Floating-point aggregation is order-dependent; the engine routes money/
ratio aggregates through exact decimal accumulation (functions/numeric.py)
precisely so this test can demand equality, not approximation.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import dsum
from csv2db_spark.sources import load_table


@pytest.mark.parametrize("nparts", [1, 7, 64])
def test_q1_aggregates_partition_invariant(spark, sf_dir, nparts):
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.groupBy("l_returnflag")
        .agg(
            dsum("l_extendedprice", 12, 2).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    shuffled = (
        li.repartition(nparts, F.col("l_partkey"))  # arbitrary re-distribution
        .groupBy("l_returnflag")
        .agg(
            dsum("l_extendedprice", 12, 2).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_minhash_signatures_partition_invariant(spark, sf_dir):
    from csv2db_spark.llm import dedup as D
    from csv2db_spark.llm.corpus import augmented_docs

    docs = augmented_docs(spark, sf_dir)
    a = D.minhash_signatures(
        D.shingle_hashes(D.shingle_table(docs, distinct=False))
    ).collect()
    b = D.minhash_signatures(
        D.shingle_hashes(
            D.shingle_table(docs.repartition(13), distinct=False)
        )
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.mark.parametrize("nparts", [1, 64])
def test_round4_gates_partition_invariant(spark, sf_dir, nparts):
    """The round-4 analytic gates must produce IDENTICAL rows whatever
    the physical distribution of their inputs — funnel joins, integer
    sufficient statistics, fixed-order BM25 sums, and the quantile cut
    all claim partition independence; this pins it."""
    from csv2db_spark.registry import load_all_queries

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    try:
        Q = load_all_queries()
        for name in (
            "q_events_funnel",
            "q_events_zscore_outliers",
            "q_text_bm25_topk",
            "q_curate_quantile_filter",
            "q_text_lexical_diversity",
        ):
            got = sorted(
                tuple(str(v) for v in row)
                for row in Q[name].fn(spark, sf_dir).collect()
            )
            key = f"_r4_invariance_{name}"
            baseline = _R4_BASELINES.setdefault(key, got)
            assert got == baseline, f"{name} differs at {nparts} partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_R4_BASELINES: dict = {}


@pytest.mark.parametrize("nparts", [1, 64])
def test_round5_gates_partition_invariant(spark, sf_dir, nparts):
    """Round-5 gates claim partition independence — canonical-string
    grouping, integer lift ranking, sketch estimates, star contraction,
    md5 split bands; this pins it across physical distributions."""
    from csv2db_spark.registry import load_all_queries

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    try:
        Q = load_all_queries()
        for name in (
            "q_curate_url_dedup",
            "q_text_collocations",
            "q_agg_approx_topk",
            "q_graph_cc_star",
            "q_curate_source_overlap",
            "q_curate_assign_split",
            "q_pipeline_curation_v3",
        ):
            got = sorted(
                tuple(str(v) for v in row)
                for row in Q[name].fn(spark, sf_dir).collect()
            )
            key = f"_r5_invariance_{name}"
            baseline = _R5_BASELINES.setdefault(key, got)
            assert got == baseline, f"{name} differs at {nparts} partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_R5_BASELINES: dict = {}
