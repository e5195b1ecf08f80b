"""Batch sessionization — gap-based session ids from the event stream.

Reference grounding: the clickstream carries `tealium_session_id`
(/root/reference/record.json:3); this operator derives sessions from raw
events: a new session starts when the gap to the previous event of the
same user exceeds 30 minutes. Classic lag → boundary flag → running sum.

Scale: one shuffle on user_id shared by both window passes (same
partitioning), then a partial+final agg that reuses it. State per user is
O(1) streaming through the sorted partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_test_spark.registry import query
from kinesis_test_spark.sources import t

GAP_MS = 30 * 60 * 1000


@query(
    "q_sessionize",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {GAP_MS}
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_seq
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_start = F.when(
        prev_ts.isNull() | ((F.unix_millis("ts") - F.unix_millis(prev_ts)) > GAP_MS), 1
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_start)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )
