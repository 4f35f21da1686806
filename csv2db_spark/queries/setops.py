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


@query(
    "q_setop_union_by_name",
    oracle="""
    WITH u AS (
        SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT s_suppkey AS id, s_name AS name, CAST(NULL AS DOUBLE) AS bal
        FROM supplier
    )
    SELECT id, name, bal FROM u
    """,
)
def q_setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-reconciling UNION (unionByName with allowMissingColumns):
    the two inputs arrive with DIFFERENT column orders and one side
    missing a column — positional UNION ALL would silently mis-map
    columns (the classic pipeline bug this operator family exists to
    prevent), by-name union aligns on names and NULL-fills the gap, the
    same reconcile-by-name rule the ingest path and the snapshot-table
    reader apply. Pure scan-side projection on each input; the union
    itself adds no exchange."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 7 == 0)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    # deliberately different column order and no bal column
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_suppkey").alias("id")
    )
    return cust.unionByName(supp, allowMissingColumns=True)
