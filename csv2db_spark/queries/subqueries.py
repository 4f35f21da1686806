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
