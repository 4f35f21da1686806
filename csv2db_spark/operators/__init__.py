from csv2db_spark.operators.asof import asof_join
from csv2db_spark.operators.relational import range_join
from csv2db_spark.operators.sorts import grouped_top_k, top_k

__all__ = ["asof_join", "range_join", "top_k", "grouped_top_k"]
