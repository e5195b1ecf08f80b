"""Kinesis source/sink configuration — the production format swap.

The hermetic test rig streams from files (streaming/pipeline.py); against
real AWS the ONLY change is the source format. This module builds that
reader, mapping each of the reference's hand-rolled mechanisms to its
connector option (SURVEY.md §2A #5-7):

    reference (consumer.py)              connector option
    ------------------------------------ -------------------------------
    get_iterator TRIM_HORIZON (:92-97)   startingPosition=TRIM_HORIZON
    BATCH_SIZE=1000 (:255)               maxFetchRecordsPerShard
    shards_info discovery (:100-112)     automatic (one partition/shard)
    DynamoDB lease table (:20-38)        checkpointLocation offset log
    SHARD_NUMBER fan-out (:260,278)      parallelism = shard count, managed

The spark-sql-kinesis connector jar is not part of this build; the builder
raises a clear error if the format is unavailable rather than failing deep
inside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_test_spark.schemas import EVENT_SCHEMA


def read_kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str = "eu-west-1",  # the reference's region (consumer.py:261)
    starting_position: str = "TRIM_HORIZON",
    max_fetch_records: int = 1000,
    endpoint_url: str | None = None,  # localstack/integration-test override
) -> DataFrame:
    """readStream over a Kinesis stream, decoded into the clickstream schema.

    Returns records as (envelope..., event struct) — the `data` payload is
    UTF-8 JSON, exactly the reference's wire format (consumer.py:123).
    """
    try:
        reader = (
            spark.readStream.format("aws-kinesis")
            .option("kinesis.streamName", stream_name)
            .option("kinesis.region", region)
            .option("kinesis.startingPosition", starting_position)
            .option("kinesis.maxFetchRecordsPerShard", str(max_fetch_records))
        )
        if endpoint_url:
            reader = reader.option("kinesis.endpointUrl", endpoint_url)
        raw = reader.load()
    except Exception as exc:  # connector jar absent in this build
        raise RuntimeError(
            "Kinesis connector (spark-streaming-sql-kinesis) not on the "
            "classpath; use the file-source rig in streaming/pipeline.py — "
            "the transformations downstream are identical"
        ) from exc
    return raw.select(
        F.col("sequenceNumber").alias("sequence_number"),
        F.col("partitionKey").alias("partition_key"),
        F.col("approximateArrivalTimestamp").alias("approximate_arrival_timestamp"),
        F.col("shardId").alias("shard_id"),
        F.from_json(F.col("data").cast("string"), EVENT_SCHEMA).alias("event"),
    )
