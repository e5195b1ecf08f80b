"""Subqueries & CTEs — scalar, IN, correlated EXISTS, multi-level WITH.

NS surface (SURVEY.md §2B): the full SQL query shape a reference user's
analytics would need. All run through spark.sql on registered views —
Catalyst decorrelates the correlated forms into joins (no per-row
re-execution, which is what makes them viable at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_test_spark.registry import query
from kinesis_test_spark.sources import views

# scalar subquery threshold computed exactly (decimal) so both engines agree
_AVG = "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"

_SCALAR_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT {_AVG} FROM orders)
"""


@query("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above 1.5× the (exact) average price — scalar subquery."""
    views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


_IN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


@query("q_subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return spark.sql(_IN_SQL)


_EXISTS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


@query("q_subquery_exists", oracle=_EXISTS_SQL)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra predicate — decorrelated by Catalyst
    into a semi join, not a per-row probe."""
    views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_CTE_SQL = """
WITH cust_orders AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey
), segments AS (
  SELECT c_custkey, c_mktsegment FROM customer
)
SELECT s.c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(co.total_spent AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue,
       CAST(SUM(co.n_orders) AS BIGINT) AS segment_orders
FROM segments s JOIN cust_orders co ON co.o_custkey = s.c_custkey
GROUP BY s.c_mktsegment
"""


@query("q_cte", oracle=_CTE_SQL)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return spark.sql(_CTE_SQL)
