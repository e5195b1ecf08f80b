from kinesis_test_spark.sources.tables import TABLES, load, t, views

__all__ = ["TABLES", "load", "t", "views"]
