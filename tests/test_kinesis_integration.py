"""Env-flagged Kinesis end-to-end integration test.

The hermetic suite covers the reference pipeline through the file-source
rig (streaming/pipeline.py) and Python DataSource shard stand-ins; this
test closes the remaining gap — the real connector — when the operator
provides one. It runs ONLY when the environment supplies:

    SPARK_KINESIS_JAR     path to the spark-sql-kinesis connector jar
    SPARK_KINESIS_STREAM  stream name to read (TRIM_HORIZON)
    SPARK_KINESIS_REGION  region        (optional, default eu-west-1)
    SPARK_KINESIS_ENDPOINT endpoint URL (optional — localstack)

and skips with a documented reason otherwise. The driver runs in a
subprocess so the connector jar can be placed on a fresh JVM classpath
(the shared test session has already started its JVM without it).

What it proves: ingest → record-level dedup → partitioned sink — the
reference's whole consumer loop (consumer.py:92-130,221-249) — runs
against a real stream with the format swap being config-only
(streaming/kinesis.py builds the reader; every downstream transformation
is byte-identical to the file-rig pipeline)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REQUIRED = ("SPARK_KINESIS_JAR", "SPARK_KINESIS_STREAM")

_DRIVER = r"""
import json, os, sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.environ["REPO_DIR"])
from kinesis_test_spark.streaming.kinesis import read_kinesis_stream

out_dir = os.environ["OUT_DIR"]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("kinesis-integration")
    .config("spark.jars", os.environ["SPARK_KINESIS_JAR"])
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

events = read_kinesis_stream(
    spark,
    stream_name=os.environ["SPARK_KINESIS_STREAM"],
    region=os.environ.get("SPARK_KINESIS_REGION", "eu-west-1"),
    endpoint_url=os.environ.get("SPARK_KINESIS_ENDPOINT"),
).select("sequence_number", "shard_id", "event.*")

# the reference's dedup gate (consumer.py:292-303), record-level
deduped = events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])

q = (
    deduped.writeStream.foreachBatch(
        lambda b, i: b.write.mode("append").parquet(out_dir)
    )
    .option("checkpointLocation", os.environ["CP_DIR"])
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()

back = spark.read.parquet(out_dir)
print(
    "KINESIS_RESULT "
    + json.dumps(
        {
            "rows": back.count(),
            "unique": back.select("event_id").distinct().count(),
            "shards": back.select("shard_id").distinct().count(),
        }
    )
)
"""


@pytest.mark.skipif(
    any(not os.environ.get(v) for v in _REQUIRED),
    reason="Kinesis integration needs SPARK_KINESIS_JAR + SPARK_KINESIS_STREAM "
    "(no connector jar ships with this build)",
)
def test_kinesis_ingest_dedup_sink_end_to_end(tmp_path):
    env = dict(os.environ)
    env["REPO_DIR"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["OUT_DIR"] = str(tmp_path / "sink")
    env["CP_DIR"] = str(tmp_path / "cp")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("KINESIS_RESULT ")
    )
    res = json.loads(line.removeprefix("KINESIS_RESULT "))
    # exactly-once after the dedup gate: every landed event_id unique
    assert res["rows"] == res["unique"]
    assert res["rows"] > 0, "stream delivered no records"
