"""Bucketed co-located join: the plan must contain NO Exchange."""

from __future__ import annotations

import pyspark.sql.functions as F

from csv2db_spark.sink import write_bucketed
from csv2db_spark.sources import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "t_bkt_o", str(tmp_path / "o"), "o_orderkey")
    write_bucketed(l, "t_bkt_l", str(tmp_path / "l"), "l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_bkt_o").join(
            spark.table("t_bkt_l"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-location: shuffle paid at write
        expected = o.join(l, o.o_orderkey == l.l_orderkey).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_o")
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")
