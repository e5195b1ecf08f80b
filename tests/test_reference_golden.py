"""The reference's one unit test, re-implemented correctly.

/root/reference/test/consumer_test.py:9-13 asserts
event_time_to_s3_key('2019-05-28 12:25:03.000') against
'y=2019/m=5/d=28/h=12/<uuid>.json' — but with `generated in expected` and a
random uuid, so it could never pass. Here: exact match on the key prefix
(month/day/hour NOT zero-padded, consumer.py:226-232), through both the
built-in expression and the Pandas UDF."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_test_spark.streaming.pipeline import local_rows

GOLDEN_IN = "2019-05-28 12:25:03.000"
GOLDEN_PREFIX = "y=2019/m=5/d=28/h=12"


def test_s3_key_builtin_golden(spark):
    df = local_rows(spark, [(GOLDEN_IN,)], "event_date_time string").select(
        F.to_timestamp("event_date_time", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts")
    )
    out = df.select(
        F.format_string(
            "y=%d/m=%d/d=%d/h=%d", F.year("ts"), F.month("ts"), F.dayofmonth("ts"), F.hour("ts")
        ).alias("key")
    ).first()["key"]
    assert out == GOLDEN_PREFIX


def test_s3_key_udf_golden(spark):
    from kinesis_test_spark.operators.udx import _s3_key_udf

    df = local_rows(spark, [(GOLDEN_IN,)], "event_date_time string").select(
        F.to_timestamp("event_date_time", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts")
    )
    assert df.select(_s3_key_udf("ts").alias("key")).first()["key"] == GOLDEN_PREFIX
