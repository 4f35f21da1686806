"""Window-function coverage (SURVEY.md §2.2 row 'Window functions' —
absent in the reference).

Each window is one hash shuffle on its partition key + an in-partition
sort. Running sums go through exact DECIMAL so the cumulative double is
engine-independent at every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import dec
from csv2db_spark.operators import grouped_top_k
from csv2db_spark.registry import query
from csv2db_spark.sources import load_table


@query(
    "q_window_rank_topn",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn, rnk, drnk
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             rank()       OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS rnk,
             dense_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS drnk
      FROM customer
    )
    WHERE rn <= 5
    """,
    bench=True,
)
def q_window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-N: rank filter right after the window so only N rows
    per group survive (Spark pushes the rn<=5 filter into the window via
    WindowGroupLimit at execution)."""
    cust = load_table(spark, sf_dir, "customer")
    w_unique = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ties = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_ties).alias("rnk"),
            F.dense_rank().over(w_ties).alias("drnk"),
        )
        .where(F.col("rn") <= 5)
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           cast(sum(cast(o_totalprice as decimal(12,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                as double) AS running_total,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 12, 2)).over(wf).cast("double").alias(
            "running_total"
        ),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "q_window_ntile_pct",
    oracle="""
    SELECT c_custkey,
           ntile(4)       OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           percent_rank() OVER (ORDER BY c_acctbal) AS pct_rank,
           cume_dist()    OVER (ORDER BY c_acctbal) AS cum_dist
    FROM customer
    """,
)
def q_window_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-order window (single partition): fine for ranked exports of
    aggregate-sized data; for raw 100 TB data, rank within hash buckets or
    pre-aggregate first — a global total order cannot scale past one task."""
    w_unique = Window.orderBy("c_acctbal", "c_custkey")
    w_ties = Window.orderBy("c_acctbal")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4).over(w_unique).alias("quartile"),
        F.percent_rank().over(w_ties).alias("pct_rank"),
        F.cume_dist().over(w_ties).alias("cum_dist"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           cast(sum(cast(c_acctbal as decimal(12,2)))
                OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
                as double) AS near_balance_sum,
           count(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
                AS near_balance_cnt
    FROM customer
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(-1000, 1000)
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.sum(dec("c_acctbal", 12, 2)).over(w).cast("double").alias(
            "near_balance_sum"
        ),
        F.count(F.lit(1)).over(w).alias("near_balance_cnt"),
    )


@query(
    "q_sort_multi_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def q_sort_multi_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k via TakeOrderedAndProject — per-partition heaps, no global
    sort (operators/sorts.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    ).limit(15)


@query(
    "q_sort_null_ordering",
    oracle="""
    WITH k AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS key
      FROM customer
    )
    SELECT c_custkey, key,
           row_number() OVER (ORDER BY key DESC NULLS LAST, c_custkey) AS pos
    FROM k
    QUALIFY pos <= 40
    """,
)
def q_sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL-ordering semantics (DESC NULLS LAST) made
    hash-checkable by freezing positions with row_number. Negative
    balances are nulled so the null bucket is non-empty."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
            F.col("c_acctbal")
        ).alias("key"),
    )
    w = Window.orderBy(F.col("key").desc_nulls_last(), "c_custkey")
    return (
        cust.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 40)
        .select("c_custkey", "key", "pos")
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value with explicit frames — last_value
    needs the full-partition frame (the default frame ends at CURRENT ROW,
    a classic silent-wrong-answer)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )
