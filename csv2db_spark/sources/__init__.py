from csv2db_spark.sources.tables import TABLES, load_table

__all__ = ["TABLES", "load_table"]
