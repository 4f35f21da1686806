"""Additional TPC-H-shaped gate queries (Q4/Q12/Q14/Q16/Q22 analogues,
adapted to the fixture's trimmed column set). Each exercises a DISTINCT
optimizer path not covered by the existing join/subquery families:

- Q4: correlated EXISTS with an inequality predicate → left-semi join
  with a non-equi condition component.
- Q12: conditional aggregation (CASE inside SUM) over a fact join.
- Q14: single-row conditional ratio with exact-decimal numerator and
  denominator (promo revenue share).
- Q16: NOT IN exclusion (rewritten to a broadcast anti join on the
  non-null key — the scale-safe form), plus count(distinct) per group.
- Q22: anti join against a fact + scalar aggregate subquery threshold.

All money arithmetic goes through the exact-decimal discipline
(functions/numeric.py) so results hash-match DuckDB at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import money, rate, sql_money, sql_rate
from csv2db_spark.registry import query
from csv2db_spark.sources import load_table


@query(
    "q_tpch_q4_exists",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders in a half-year window having at least one line item
    shipped after the order date, counted by priority. The EXISTS becomes
    a LEFT SEMI join whose condition carries the l_shipdate >
    o_orderdate inequality — Spark pushes the equi part (l_orderkey) into
    the hash join and evaluates the inequality as a join residual, so no
    per-order subquery ever runs. Date predicates push to the orders
    scan."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sat = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "semi",
    )
    return sat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q_tpch_q12_case_agg",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN {sql_money('l.l_extendedprice')}
                         ELSE {sql_money('0')} END) as double) AS high_revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q_tpch_q12_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional tallies (CASE inside SUM) partitioned by
    priority class over a fact-fact join. Ship-date range pushes to the
    lineitem scan; the CASE branches evaluate inside the aggregate's
    partial (map-side) phase — one shuffle on l_orderkey, one on the
    group key."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
            F.sum(
                F.when(high, money("l_extendedprice")).otherwise(money(F.lit(0)))
            )
            .cast("double")
            .alias("high_revenue"),
        )
    )


@query(
    "q_tpch_q14_promo_ratio",
    oracle=f"""
    SELECT cast(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN {sql_money('l.l_extendedprice')} * (1 - {sql_rate('l.l_discount')})
                   ELSE {sql_money('0')} * (1 - {sql_rate('0')}) END) * 100 as double)
           / cast(sum({sql_money('l.l_extendedprice')} * (1 - {sql_rate('l.l_discount')})) as double)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-02-01 00:00:00'
    """,
)
def q_tpch_q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share — a single-row conditional ratio.
    Both numerator and denominator accumulate as exact decimals (the
    CASE's else-branch uses the same decimal expression so the sum stays
    in one decimal type); the one final double division is IEEE-identical
    on both engines. part is a broadcast dimension."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    zero = money(F.lit(0)) * (F.lit(1) - rate(F.lit(0)))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (F.sum(promo) * F.lit(100)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q_tpch_q16_notin_distinct",
    oracle="""
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'SMALL%'
      AND p.p_size NOT IN (
        SELECT DISTINCT p_size FROM part WHERE p_retailprice > 999.0
      )
    GROUP BY p.p_brand, p.p_type
    """,
)
def q_tpch_q16_notin_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier variety per (brand, type) with brand/type/size
    exclusions. The oracle's NOT IN subquery is deliberately rewritten as
    a plain broadcast ANTI join on the Spark side: NOT IN over a nullable
    column forces Spark's null-aware anti join (potentially a broadcast
    nested-loop at scale), while p_size is non-null by schema — the
    rewrite is semantics-identical here and is THE standard scale fix for
    NOT IN. count(distinct) runs as a two-phase expand+aggregate; the
    size exclusion list is tiny → broadcast."""
    p = load_table(spark, sf_dir, "part")
    excluded_sizes = p.where(F.col("p_retailprice") > 999.0).select(
        "p_size"
    ).distinct()
    pf = (
        p.where(F.col("p_brand") != "Brand#1")
        .where(~F.col("p_type").like("SMALL%"))
        .join(
            F.broadcast(excluded_sizes),
            p.p_size == excluded_sizes.p_size,
            "anti",
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q22_antijoin_scalar",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS numcust,
           cast(sum(cast(c.c_acctbal as decimal(12,2))) as double) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT cast(sum(cast(c_acctbal as decimal(12,2))) as double) / count(*)
        FROM customer WHERE c_acctbal > 0.00
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c.c_mktsegment
    """,
)
def q_tpch_q22_antijoin_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: well-funded customers with no RECENT orders (none since
    1999), by segment. The scalar average broadcasts as a one-row cross
    join (no per-row subquery); the NOT EXISTS is a plain anti join on
    o_custkey with the date predicate pushed to the orders scan before
    the anti side is built. avg goes through exact decimal, and the
    comparison threshold is the same double on both engines, so the
    boundary rows agree. (The fixture's orders cover every customer, so
    the textbook "never ordered" predicate is empty at every SF — the
    recency variant keeps the identical plan shape with non-trivial
    output.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    thr = (
        c.where(F.col("c_acctbal") > 0.00)
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
             / F.count(F.lit(1))).alias("thr")
        )
    )
    return (
        c.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("thr"))
        .join(o, c.c_custkey == o.o_custkey, "anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
