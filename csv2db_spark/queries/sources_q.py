"""Driver-gate queries for extended sources/sinks and merge.

- JSON / ORC roundtrips: write a deterministic slice of ``orders`` out
  through the format, read it back with the explicit schema, aggregate.
  The oracle computes the same aggregate straight from the parquet view —
  matching hashes prove the format roundtrip is value- and
  schema-preserving (the reference supports only CSV in / JDBC out;
  SURVEY.md §2.2 'Scans/sources').
- Upsert: merge-by-key (operators/merge.py) against a derived change
  set; oracle is the equivalent anti-join + union in SQL.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import dsum, sql_dsum
from csv2db_spark.operators.merge import upsert
from csv2db_spark.registry import query
from csv2db_spark.sources import load_table

_RT_DIRS: dict[str, str] = {}


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """orders slice -> write fmt -> read back (explicit schema) -> agg."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    key = f"{fmt}:{sf_dir}"
    path = _RT_DIRS.get(key)
    if path is None:
        path = os.path.join(
            tempfile.mkdtemp(prefix=f"c2s_rt_{fmt}_"), "orders"
        )
        _RT_DIRS[key] = path
    src.write.mode("overwrite").format(fmt).save(path)
    back = spark.read.format(fmt).schema(src.schema).load(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            dsum("o_totalprice", 12, 2).alias("sum_price"),
            F.max("o_orderdate").alias("max_date"),
        )
    )


_RT_ORACLE = f"""
SELECT o_orderstatus,
       count(*) AS n,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key,
       {sql_dsum("o_totalprice", 12, 2)} AS sum_price,
       max(o_orderdate) AS max_date
FROM orders
GROUP BY o_orderstatus
"""


@query("q_src_json_roundtrip", oracle=_RT_ORACLE)
def q_src_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@query("q_src_orc_roundtrip", oracle=_RT_ORACLE)
def q_src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "orc")


_UPSERT_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
chg AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice
  FROM base WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
         o_totalprice
  FROM base WHERE o_orderkey % 7 = 0
)
SELECT * FROM chg
UNION ALL
SELECT b.* FROM base b
WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.o_orderkey = b.o_orderkey)
"""


@query("q_merge_upsert", oracle=_UPSERT_ORACLE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics: derived change set (updates on key%10, inserts
    with shifted keys on key%7) merged into orders by key — change rows
    win, untouched base rows survive."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = base.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    inserts = base.where(F.col("o_orderkey") % 7 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    return upsert(base, updates.unionByName(inserts), ["o_orderkey"])
