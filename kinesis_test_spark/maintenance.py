"""Table maintenance: small-file compaction.

Streaming sinks accrete one-file-per-batch-per-partition; at 100 TB the
file count, not the byte count, becomes the bottleneck (driver listing
memory, task-launch overhead, NN/object-store request pressure). The
compactor rewrites each partition's many small files into size-targeted
files, byte-identical in content.

This is the maintenance job an engine must ship alongside a partitioned
sink — the reference just leaks one uuid-named object per batch forever
(consumer.py:235-249).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession


def compact_partitioned(
    spark: SparkSession,
    path: str | Path,
    fmt: str = "json",
    partition_cols: tuple[str, ...] = ("y", "m", "d", "h"),
    target_files_per_partition: int = 1,
    schema=None,
) -> Path:
    """Rewrite a partitioned directory with `target_files_per_partition`
    files per partition dir. Returns the compacted location (side-by-side
    `<path>__compacted`; atomic swap is the caller's policy).

    repartition on the partition columns clusters each partition's rows
    into one task's output; for >1 target file, salt is added.
    """
    path = Path(path)
    out = path.with_name(path.name + "__compacted")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("basePath", str(path)).format(fmt).load(str(path))
    if target_files_per_partition == 1:
        clustered = df.repartition(*partition_cols)
    else:
        from pyspark.sql import functions as F

        clustered = df.repartition(
            *partition_cols, (F.spark_partition_id() % target_files_per_partition)
        )
    (
        clustered.write.partitionBy(*partition_cols)
        .mode("overwrite")
        .format(fmt)
        .save(str(out))
    )
    return out
