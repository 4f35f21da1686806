"""Accuracy bounds for the approximate aggregates (their gate queries are
rows-only — sketches are engine-specific — so the accuracy contract is
asserted here against the exact computation)."""

from __future__ import annotations

import pyspark.sql.functions as F

from csv2db_spark.sources import load_table


def test_approx_percentile_within_one_percent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("exact"),
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("approx"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) / r.exact < 0.01


def test_approx_count_distinct_within_five_percent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
    ).collect()[0]
    assert abs(r.approx - r.exact) / r.exact < 0.05


def test_hll_distinct_accuracy_and_determinism(spark):
    from csv2db_spark.operators.sketch import hll_distinct

    # 5000 distinct ids: raw HLL-64 estimate should land within ~3
    # standard errors (1.04/sqrt(64) ~ 13% each)
    df = spark.range(5000).select((F.col("id") * 7919).alias("item"))
    est = hll_distinct(df).collect()[0]
    assert 0.6 * 5000 <= est.est_distinct <= 1.4 * 5000
    assert est.n_registers == 64
    # duplicates must not move the estimate (distinct semantics)
    dup = df.unionAll(df).unionAll(df)
    est_dup = hll_distinct(dup).collect()[0]
    assert est_dup.est_distinct == est.est_distinct
    # partition invariance: register maxes are order-free
    est64 = hll_distinct(df.repartition(64)).collect()[0]
    assert est64.est_distinct == est.est_distinct


def test_hll_registers_merge_by_max(spark):
    # the mergeable-sketch contract: sketching two shards separately and
    # merging registers by MAX equals sketching the union
    import pyspark.sql.functions as SF

    from csv2db_spark.operators.sketch import hll_distinct

    a = spark.range(0, 3000).select(SF.col("id").alias("item"))
    b = spark.range(2000, 6000).select(SF.col("id").alias("item"))
    whole = hll_distinct(a.unionAll(b)).collect()[0]
    # merge = estimate over the concatenated item stream of both shards
    # (register max is associative/commutative, so this IS the merge)
    merged = hll_distinct(b.unionAll(a)).collect()[0]
    assert whole.est_distinct == merged.est_distinct


def test_hll_register_table_merges_through_merge_aggregates(spark):
    # incremental distinct-count maintenance: per-shard HLL register
    # tables folded with merge_aggregates(maxs=...) must equal the
    # registers of a from-scratch pass — max is algebraic, so the
    # standing rollup pattern works for distinct estimation too
    import pyspark.sql.functions as SF

    from csv2db_spark.operators.merge import merge_aggregates
    from csv2db_spark.operators.sketch import HLL_M, HLL_REG_BITS, HLL_WBITS

    def registers(df):
        h = SF.conv(
            SF.substring(SF.md5(SF.col("item").cast("string")), 1, 12), 16, 10
        ).cast("long")
        prepared = df.select(
            (h % HLL_M).alias("j"), SF.shiftright(h, HLL_REG_BITS).alias("w")
        ).select(
            "j",
            SF.when(SF.col("w") == 0, SF.lit(HLL_WBITS + 1))
            .otherwise(SF.lit(HLL_WBITS + 1) - SF.length(SF.expr("bin(w)")))
            .alias("rho"),
        )
        return prepared.groupBy("j").agg(SF.max("rho").alias("m_j"))

    a = spark.range(0, 2500).select(SF.col("id").alias("item"))
    b = spark.range(2000, 5000).select(SF.col("id").alias("item"))
    merged = merge_aggregates(
        registers(a), registers(b), keys=["j"], maxs=["m_j"]
    )
    whole = registers(a.unionAll(b))
    got = {r.j: r.m_j for r in merged.collect()}
    want = {r.j: r.m_j for r in whole.collect()}
    assert got == want


def test_histogram_quantile_within_bucket_width(spark):
    from csv2db_spark.operators.sketch import hll_distinct  # noqa: F401
    from csv2db_spark.operators.profile import histogram_quantile

    # uniform 0..9999: exact pNN = NN0 (ish); bucket width 100
    df = spark.range(10000).select(F.col("id").cast("double").alias("x"))
    out = {r.q: r for r in histogram_quantile(
        df, "x", lo=0.0, hi=10000.0, n_buckets=100, qs=(25, 50, 75, 90)
    ).collect()}
    import numpy as np

    vals = np.arange(10000)
    for q in (25, 50, 75, 90):
        exact = float(np.percentile(vals, q))
        assert abs(out[q].est_value - exact) <= 100.0 + 1  # one bucket
    # deterministic under repartitioning
    out64 = {r.q: r.est_value for r in histogram_quantile(
        df.repartition(64), "x", lo=0.0, hi=10000.0, n_buckets=100,
        qs=(25, 50, 75, 90)
    ).collect()}
    assert out64 == {q: r.est_value for q, r in out.items()}


def test_histogram_quantile_clamps_out_of_range(spark):
    from csv2db_spark.operators.profile import histogram_quantile

    # values beyond [lo, hi) land in the edge buckets, never lost
    df = spark.createDataFrame(
        [(-50.0,), (5.0,), (15.0,), (999.0,)], ["x"]
    )
    out = {r.q: r for r in histogram_quantile(
        df, "x", lo=0.0, hi=20.0, n_buckets=2, qs=(50, 100)
    ).collect()}
    assert out[100].target_rank == 4  # all four rows counted
    assert 0 <= out[50].bucket <= 1


def test_silhouette_proxy_bounds_and_degenerate(spark):
    from csv2db_spark.llm.cluster import silhouette_proxy

    rows = [
        (0, [1.0, 0.0]),   # centroid A
        (1, [0.0, 1.0]),   # centroid B
        (2, [0.9, 0.1]),   # near A -> high silhouette
        (3, [0.5, 0.5]),   # equidistant -> silhouette 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.where("vec_id < 2").selectExpr(
        "vec_id as cluster_id", "embedding"
    )
    out = {r.vec_id: r for r in silhouette_proxy(df, cents).collect()}
    for r in out.values():
        assert 0.0 <= r.silhouette <= 1.0
        assert r.d2_next >= r.d2_own >= 0
    assert out[2].cluster_id == 0 and out[2].silhouette > 0.5
    assert out[3].silhouette == 0.0  # tie: b == a
    # duplicate centroids: a == b == 0 must yield 0, not NaN
    dup_cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0])],
        "cluster_id long, embedding array<double>",
    )
    out_dup = {r.vec_id: r for r in silhouette_proxy(df, dup_cents).collect()}
    assert out_dup[0].silhouette == 0.0


def test_countmin_join_size_upper_bound(spark):
    from csv2db_spark.operators.sketch import countmin_build, countmin_join_size

    a = spark.range(3000).select((F.col("id") % 500).cast("string").alias("item"))
    b = spark.range(1000).select((F.col("id") % 500).cast("string").alias("item"))
    est = countmin_join_size(
        countmin_build(a, d=4, w=4096), countmin_build(b, d=4, w=4096)
    ).collect()[0].est_join_size
    true_n = a.join(b, "item").count()
    assert est >= true_n          # collisions only add
    assert est <= true_n * 1.5    # w >> keys keeps the bound tight
    # deterministic under repartitioning
    est64 = countmin_join_size(
        countmin_build(a.repartition(64), d=4, w=4096),
        countmin_build(b.repartition(64), d=4, w=4096),
    ).collect()[0].est_join_size
    assert est64 == est
