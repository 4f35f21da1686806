"""Subquery patterns (scalar / IN / correlated) — SURVEY.md §2.2.

Scalar subqueries become broadcast cross-joins of a 1-row aggregate (the
threshold is computed once, shipped to every executor — no shuffle of the
fact side). Correlated max-per-group becomes a window, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import davg, sql_davg
from csv2db_spark.registry import query
from csv2db_spark.sources import load_table


@query(
    "q_subq_scalar_threshold",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT {sql_davg("o_totalprice", 12, 2)} FROM orders)
    """,
)
def q_subq_scalar_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    thr = orders.agg(davg("o_totalprice", 12, 2).alias("__thr"))
    return (
        orders.crossJoin(F.broadcast(thr))
        .where(F.col("o_totalprice") > F.col("__thr"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_subq_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT'
                          AND o_totalprice > 300000)
    """,
)
def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark SQL text path: IN-subqueries plan as left-semi joins."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT'
                              AND o_totalprice > 300000)
        """
    )


@query(
    "q_subq_correlated_max",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_subq_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated max-per-group decorrelated into a window max — one
    shuffle instead of the naive O(n^2) rescans."""
    w = Window.partitionBy("o_custkey")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("__mx", F.max("o_totalprice").over(w))
        .where(F.col("o_totalprice") == F.col("__mx"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q_subq_having_in",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 150
    )
    SELECT o.o_orderkey,
           o.o_custkey,
           o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
    """,
)
def q_subq_having_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a HAVING aggregate (large-volume
    orders), then re-join and re-aggregate. Catalyst rewrites the IN to a
    left-semi join on the aggregated subquery — the membership set stays
    distributed; nothing collects to the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
    )
