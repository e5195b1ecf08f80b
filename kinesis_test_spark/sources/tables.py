"""Batch table sources.

The reference's scan path is `get_records` → JSON decode
(`/root/reference/consumer.py:115-130`); here the batch analogue is the
vectorized Parquet reader with Catalyst column pruning + predicate pushdown
— callers just ``select``/``filter`` and the scan narrows itself (verify
with ``plans.scan_info``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan; pruning/pushdown left to Catalyst.

    `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark lacks a
    type for; with `spark.sql.legacy.parquet.nanosAsLong` it scans as a long
    that we floor-truncate to a µs timestamp — exactly what DuckDB/Arrow do
    when reading the same file, so oracle comparisons line up.
    """
    if name not in TABLES:
        raise KeyError(name)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLES}


def views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based operators)."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
