"""Set operations: UNION [ALL], INTERSECT, EXCEPT.

NS surface (SURVEY.md §2B). UNION ALL is free (no shuffle — just plan
concatenation); the distinct variants shuffle on all columns, so at scale
prefer pre-aggregated inputs or key-only set ops, as done here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_test_spark.registry import query
from kinesis_test_spark.sources import t


@query(
    "q_union",
    oracle="""
SELECT event_id, event_type FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("event_id", "event_type")
    b = ev.filter(F.col("event_type") == "purchase").select("event_id", "event_type")
    return a.unionByName(b)


@query(
    "q_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE value > 0.5
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 0.5).select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.unionByName(b).distinct()


@query(
    "q_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both an urgent and a low-priority order."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    # subtract == EXCEPT DISTINCT (exceptAll().distinct() would differ when
    # a key appears more often on the left than the right)
    return c.subtract(o)


@query(
    "q_sort_nulls",
    oracle="""
SELECT event_id, value,
       CASE WHEN value < 0.2 THEN NULL ELSE event_type END AS et
FROM events
ORDER BY et ASC NULLS LAST, value DESC, event_id
LIMIT 100
""",
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST ordering (engines default differently:
    Spark ASC puts nulls first, DuckDB last — always state it)."""
    ev = t(spark, sf_dir, "events")
    et = F.when(F.col("value") < 0.2, F.lit(None)).otherwise(F.col("event_type"))
    return (
        ev.select("event_id", "value", et.alias("et"))
        .orderBy(F.col("et").asc_nulls_last(), F.col("value").desc(), F.col("event_id"))
        .limit(100)
    )
