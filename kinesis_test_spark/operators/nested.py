"""Nested clickstream wire-format parsing — the reference's decode path done
right (SURVEY.md §1.3).

The reference does `json.loads(r['Data'].decode())` and crashes on any
malformed payload or missing key (consumer.py:123,237). The engine parses
the same wire shape with an explicit StructType (schemas.EVENT_SCHEMA) in
PERMISSIVE mode: malformed records land in `_corrupt_record` instead of
killing the worker — same accepted inputs, strictly better failure mode.

These queries synthesize the wire JSON from the events table (so the oracle
can state expected values directly), then prove round-trip: build →
from_json(PERMISSIVE) → nested access / full flatten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_test_spark import schemas
from kinesis_test_spark.registry import query
from kinesis_test_spark.sources import t


def _wire_json() -> Column:
    """Wire-form JSON string per event (record.json:3 shape, abridged),
    corrupted (trailing garbage) when value < 0.1 to exercise PERMISSIVE."""
    good = F.concat(
        F.lit('{"event_type":"'),
        F.col("event_type"),
        F.lit('","event_id":"'),
        F.col("event_id").cast("string"),
        F.lit('","event_date_time":"'),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS"),
        F.lit('","visit":{"tealium_session_id":"'),
        (F.col("user_id") % 100).cast("string"),
        F.lit('-sess","device":{"useragent":"ua-'),
        F.col("event_type"),
        F.lit('","user":{"user_id":"'),
        F.col("user_id").cast("string"),
        F.lit('"}}},"message_event_types":["raw_event","'),
        F.col("event_type"),
        F.lit('"]}'),
    )
    # leading garbage: Spark's Jackson parser tolerates TRAILING junk after
    # a complete object, so corruption must break the payload's start
    return F.when(F.col("value") < 0.1, F.concat(F.lit("<garbage>"), good)).otherwise(good)


def _parse_schema() -> T.StructType:
    s = T.StructType(schemas.EVENT_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType(), True)])
    return s


@query(
    "q_nested_parse",
    oracle="""
SELECT event_id AS src_event_id,
       CASE WHEN ok AND NOT corrupt THEN CAST(user_id AS VARCHAR) END AS parsed_user_id,
       CASE WHEN ok AND NOT corrupt
            THEN CAST(user_id % 100 AS VARCHAR) || '-sess' END AS session_id,
       CASE WHEN ok AND NOT corrupt
            THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%g') END AS event_date_time,
       CASE WHEN ok AND NOT corrupt THEN CAST(2 AS BIGINT) END AS n_message_types,
       corrupt AS is_corrupt
FROM (SELECT *,
             event_id IS NOT NULL AND user_id IS NOT NULL
               AND event_type IS NOT NULL AND ts IS NOT NULL AS ok,
             COALESCE(value < 0.1, FALSE)
               AND (event_id IS NOT NULL AND user_id IS NOT NULL
                    AND event_type IS NOT NULL AND ts IS NOT NULL) AS corrupt
      FROM events)
""",
)
def q_nested_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json(PERMISSIVE) over the nested wire form: valid payloads parse
    into the full EVENT_SCHEMA (3-level struct access), corrupt ones yield
    NULL fields + the raw text in _corrupt_record. NULL semantics
    (probe_nulls class 2): a NULL event_id/user_id/event_type/ts nulls the
    CONCATENATED payload, so from_json sees NULL input — every parsed
    field is NULL and is_corrupt is FALSE (no corrupt record was seen);
    a NULL value falls through F.when to the un-corrupted branch. The
    oracle's ok/corrupt flags restate exactly that truth table."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.select(
        F.col("event_id").alias("src_event_id"),
        F.from_json(
            _wire_json(),
            _parse_schema(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("e"),
    )
    return parsed.select(
        "src_event_id",
        F.col("e.visit.device.user.user_id").alias("parsed_user_id"),
        F.col("e.visit.tealium_session_id").alias("session_id"),
        F.col("e.event_date_time").alias("event_date_time"),
        F.size("e.message_event_types").cast("bigint").alias("n_message_types"),
        F.col("e._corrupt_record").isNotNull().alias("is_corrupt"),
    )


@query(
    "q_nested_flatten",
    oracle="""
SELECT event_id AS src_event_id,
       CASE WHEN ok THEN CAST(user_id AS VARCHAR) END AS visit_device_user_user_id,
       CASE WHEN ok THEN 'ua-' || event_type END AS visit_device_useragent,
       CASE WHEN ok THEN CAST(user_id % 100 AS VARCHAR) || '-sess' END
         AS visit_tealium_session_id,
       CASE WHEN ok THEN event_type END AS event_type
FROM (SELECT *, event_id IS NOT NULL AND user_id IS NOT NULL
               AND event_type IS NOT NULL AND ts IS NOT NULL AS ok
      FROM events)
WHERE value >= 0.1
""",
)
def q_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full wire → nested parse → generic recursive flatten, reproducing the
    event.py naming exactly (visit.device.user.user_id →
    visit_device_user_user_id, event.py:15). NULL semantics (probe_nulls
    class 2): as q_nested_parse — a NULL wire component nulls the whole
    payload, so every flattened field (including event_type, which is
    re-read from the PARSED struct) is NULL for that row."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.filter(F.col("value") >= 0.1).select(
        F.col("event_id").alias("src_event_id"),
        F.from_json(_wire_json(), schemas.EVENT_SCHEMA).alias("e"),
    )
    flat = schemas.flatten(parsed.select("src_event_id", "e.*"))
    return flat.select(
        "src_event_id",
        "visit_device_user_user_id",
        "visit_device_useragent",
        "visit_tealium_session_id",
        "event_type",
    )
