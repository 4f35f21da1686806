"""Partition pruning and salted-join physical checks: the gate queries
prove values; these tests prove the PLAN does what PLANS.md claims."""

from __future__ import annotations

import pyspark.sql.functions as F

from csv2db_spark.operators.skew import salted_join
from csv2db_spark.queries.sources_q import q_sink_partitioned_pruning
from csv2db_spark.sources import load_table


def test_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_part")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # pruned scan must read fewer files than the full table
    full = spark.read.parquet(path)
    assert back.count() < full.count()
    assert back.count() == src.where(F.col("o_orderstatus") == "F").count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    plain = li.join(sup, "l_suppkey").groupBy("s_nationkey").count()
    salted = (
        salted_join(li, sup, on="l_suppkey", salt=8)
        .groupBy("s_nationkey")
        .count()
    )
    assert sorted(plain.collect()) == sorted(salted.collect())
