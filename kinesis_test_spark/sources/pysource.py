"""Custom Python DataSource (Spark 4 DataSource API) — a deterministic
clickstream generator partitioned like a Kinesis stream.

The reference's source layer is hand-rolled shard discovery + per-shard
iterators (/root/reference/consumer.py:92-130). Spark 4's Python
DataSource API is the engine-native way to build such a source: the
planner asks for partitions (≙ shards), each partition reads
independently on an executor (≙ per-shard iterator), and the rows enter
the DataFrame world with a declared schema.

Everything generated is a function of the row id through the portable
md5 projection (functions/porthash.py), so a DuckDB oracle can state the
expected content exactly — even a custom source stays inside the
correctness gate.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENT_TYPES = ["click", "purchase", "error", "signup", "view"]
N_ROWS = 1000
N_SHARDS = 4

SCHEMA = StructType(
    [
        StructField("row_id", LongType(), False),
        StructField("shard_id", IntegerType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


def _hex16(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


class ShardPartition(InputPartition):
    def __init__(self, shard: int, start: int, end: int):
        self.shard = shard
        self.start = start
        self.end = end


class ClickstreamReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", N_ROWS))
        self.n_shards = int(options.get("shards", N_SHARDS))

    def partitions(self):
        # shard discovery (consumer.py:100-112): contiguous row ranges
        per = self.n_rows // self.n_shards
        return [
            ShardPartition(s, s * per, self.n_rows if s == self.n_shards - 1 else (s + 1) * per)
            for s in range(self.n_shards)
        ]

    def read(self, partition: ShardPartition):
        # per-shard iterator (consumer.py:115-130), executed on an executor
        for i in range(partition.start, partition.end):
            yield (
                i,
                partition.shard,
                _hex16(f"u|{i}") % 50,
                EVENT_TYPES[_hex16(f"t|{i}") % 5],
                _hex16(f"v|{i}") / 65536.0,  # k/2^16: exact in binary, no rounding needed
            )


class ClickstreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "clickstream_synth"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return ClickstreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ClickstreamDataSource)


# ---------------------------------------------------------------------------
# streaming variant — the reference's iterator/checkpoint protocol, natively
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class ClickstreamStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed micro-batch reader.

    This is exactly the loop the reference hand-builds with shard iterators
    and a DynamoDB lease table (consumer.py:92-130, 169-218): the engine
    asks for the initial offset (≙ TRIM_HORIZON), reads (start → start+batch)
    on each trigger (≙ get_records with Limit), and persists the committed
    offset in the checkpoint log (≙ update_checkpoint) — restart resumes
    from the last committed offset with no duplicate emission.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("rows", N_ROWS))
        self.batch = int(options.get("batch", 250))  # reference default 1000

    def initialOffset(self):
        return {"row": 0}

    def read(self, start: dict):
        end_row = min(start["row"] + self.batch, self.n_rows)
        rows = [
            (
                i,
                0,
                _hex16(f"u|{i}") % 50,
                EVENT_TYPES[_hex16(f"t|{i}") % 5],
                _hex16(f"v|{i}") / 65536.0,
            )
            for i in range(start["row"], end_row)
        ]
        return iter(rows), {"row": end_row}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = [
            (
                i,
                0,
                _hex16(f"u|{i}") % 50,
                EVENT_TYPES[_hex16(f"t|{i}") % 5],
                _hex16(f"v|{i}") / 65536.0,
            )
            for i in range(start["row"], end["row"])
        ]
        return iter(rows)


class ClickstreamStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "clickstream_synth_stream"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        return ClickstreamStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(ClickstreamStreamDataSource)


# ---------------------------------------------------------------------------
# Python DataSink (the write-side extension point)
# ---------------------------------------------------------------------------


class JsonlWriter:
    """Executor-side writer: one JSONL file per task, committed via the
    standard commit protocol (write to a task-unique name; the driver's
    commit makes the batch visible — same contract a real object-store
    sink implements)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext
        from pyspark.sql.datasource import WriterCommitMessage

        tc = TaskContext.get()
        part = tc.partitionId() if tc is not None else 0
        os.makedirs(self.path, exist_ok=True)
        name = os.path.join(self.path, f"part-{part:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(name, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return WriterCommitMessage()


class JsonlSinkDataSource(DataSource):
    """Custom Python DataSink: df.write.format("jsonl_sink") — rows leave
    the DataFrame world through user Python, partition-parallel."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        from pyspark.sql.datasource import DataSourceWriter

        path = self.options["path"]

        class _W(DataSourceWriter):
            def write(self, iterator):
                return JsonlWriter(path).write(iterator)

        return _W()


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
