"""SparkSession factory.

Scale posture: these configs are the local[N] analogue of a 1000-executor
cluster setup — AQE for runtime re-planning (partition coalescing, skew-join
splitting), Arrow for any Python exchange, UTC to keep event-time semantics
deterministic, and shuffle partitions sized to the parallelism actually
available instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "kinesis_test_spark", driver_mem: str | None = None) -> SparkSession:
    """Build (or fetch) the engine session.

    AQE is on so runtime statistics can re-plan joins (broadcast demotion/
    promotion, skew splitting) — at 100 TB that, not static tuning, is what
    keeps shuffle stages healthy.
    """
    n = cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no ns
        # type — read as long and convert in sources.tables (µs truncation,
        # matching DuckDB/Arrow semantics).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local file: scheme without the ChecksumFileSystem wrapper — every
        # local write otherwise lands a .crc sidecar next to each file,
        # doubling the file count of partitioned sinks (measured 3x on the
        # 720-dir y/m/d/h JSON sink: per-file create+rename dominates, not
        # bytes). Scheme-scoped: on a cluster the data path is hdfs:// or
        # s3a://, where this conf is inert and those filesystems carry
        # their own integrity checks (as does parquet via column CRCs).
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # RocksDB state store as the streaming default: state lives off-heap
        # and spills to disk, so stateful queries (dedup gate, session
        # windows, running counts) survive 100 TB-scale key cardinality that
        # would OOM the HDFS-backed in-memory store. Maintenance uploads
        # changelogs instead of full snapshots.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
