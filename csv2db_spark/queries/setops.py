"""Set-operation coverage (SURVEY.md §2.2 row 'Set ops' — absent in the
reference). UNION/INTERSECT/EXCEPT with SQL bag/set semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2db_spark.registry import query
from csv2db_spark.sources import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nk")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nk")
    )


@query(
    "q_setop_union",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "q_setop_union_all_counts",
    oracle="""
    SELECT nk, count(*) AS n
    FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    )
    GROUP BY nk
    """,
)
def q_setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .unionAll(_supp_nations(spark, sf_dir))
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_setop_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "q_setop_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@query(
    "q_setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 0
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two sides)
    — distinct from the set variant already covered."""
    a = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_nationkey").alias("nk"))
    )
    b = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return a.intersectAll(b)


@query(
    "q_setop_except_all",
    oracle="""
    SELECT o_custkey AS ck FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity = left minus right count,
    floored at zero)."""
    a = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ck"))
    b = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("ck"))
    )
    return a.exceptAll(b)
