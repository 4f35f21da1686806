"""csv2db-spark: a PySpark-native analytics engine with the capabilities of
and-hom/csv2db, extended with the relational / streaming / LLM-data operator
surface defined in SURVEY.md §7.

Design stance (SURVEY.md §7.1): idiomatic PySpark — declare logical plans with
the DataFrame/SQL API, let Catalyst + Tungsten pick physical strategy. No
custom execution engine, no RDDs in the hot path, Pandas UDFs only where
built-in operators cannot express the semantics.
"""

from csv2db_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
