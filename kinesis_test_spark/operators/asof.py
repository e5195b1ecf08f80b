"""As-of join — "latest event at or before each order's timestamp, per key".

Spark SQL has no native ASOF JOIN; the engine expresses it as a range join
plus a ranked-window filter — pure built-ins, fully distributed:

    orders LEFT JOIN events ON key match AND e.ts <= o.ts
    → row_number() PARTITION BY order ORDER BY e.ts DESC (tie-broken)
    → keep rn = 1

Scale path for 100 TB: the naive range join can explode (every order ×
every earlier event of that user). The mitigation, same idea as
bucketed interval joins: pre-bucket both sides by (key, time_bucket) and
union the "same bucket" join with a per-bucket "latest before bucket"
rollup, keeping the join fan-out bounded by bucket width. The windowed
filter afterwards is identical. The DuckDB oracle uses the same ranked
formulation (DuckDB's native ASOF JOIN leaves equal-timestamp ties
unspecified, so the ranked form is the portable semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_test_spark.registry import query
from kinesis_test_spark.sources import t


@query(
    "q_join_asof",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate, last_event_id, last_event_ts
FROM (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
         e.event_id AS last_event_id, e.ts AS last_event_ts,
         row_number() OVER (PARTITION BY o.o_orderkey
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM orders o
  LEFT JOIN events e ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
) WHERE rn = 1
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order: the latest event of that user at or before the order
    date (LEFT semantics — orders with no prior event keep NULLs)."""
    o = t(spark, sf_dir, "orders")
    e = t(spark, sf_dir, "events")
    joined = o.join(
        e, (e.user_id == o.o_custkey) & (e.ts <= o.o_orderdate), "left"
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        joined.select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_event_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
