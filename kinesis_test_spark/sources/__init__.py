from kinesis_test_spark.sources.tables import (
    SQL_UNIQUE_DOCS,
    TABLES,
    load,
    t,
    unique_docs,
    views,
)

__all__ = ["SQL_UNIQUE_DOCS", "TABLES", "load", "t", "unique_docs", "views"]
