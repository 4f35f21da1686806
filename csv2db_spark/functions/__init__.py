from csv2db_spark.functions.numeric import davg, dec, dsum, money, rate

__all__ = ["davg", "dec", "dsum", "money", "rate"]
