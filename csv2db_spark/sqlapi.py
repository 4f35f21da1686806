"""SQL front-end: run ANSI SQL directly against the fixture tables.

The engine's primary surface is the Python operator library, but a user
migrating from any SQL warehouse (or from the reference's psql-side
queries — and-hom/csv2db loads INTO a SQL database precisely so the user
can query it with SQL) expects to type SQL. Spark already ships a full
ANSI-compliant SQL compiler (the same Catalyst plans the DataFrame API
builds), so the front-end costs nothing: register each parquet table as
a temp view and hand the string to ``spark.sql``.

Views are plain metadata (no scan happens at registration), registration
is idempotent per session, and every Catalyst optimization — predicate
pushdown into the parquet scan, join reordering, AQE — applies exactly
as it does for the DataFrame operators. At 100 TB the view layer adds
zero overhead: the physical plan is identical to the hand-built one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from csv2db_spark.sources.tables import TABLES, load_table


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every fixture table as a session temp view (idempotent).

    Uses ``load_table`` so the views carry the same schema normalization
    (nanos timestamps → NTZ) as the operator library — SQL and DataFrame
    results stay comparable."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the fixture views, then compile and return ``sql``.

    The returned DataFrame is lazy — nothing runs until an action — and
    composes with every operator in the package (a SQL result can feed
    ``mmr_rerank`` or a sink exactly like a DataFrame-built one)."""
    register_tables(spark, sf_dir)
    return spark.sql(sql)
