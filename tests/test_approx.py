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
