from csv2db_spark.sources.jdbc import read_jdbc_table
from csv2db_spark.sources.tables import TABLES, load_table

__all__ = ["TABLES", "load_table", "read_jdbc_table"]
