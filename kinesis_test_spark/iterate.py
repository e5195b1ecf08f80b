"""Lineage control for iterative operators (label propagation, Lloyd loops).

Iterative DataFrame algorithms must truncate lineage every round or the
plan grows unboundedly. Two truncation modes:

  * ``localCheckpoint`` — blocks cached on executors. Fast, but an executor
    loss destroys both the lineage AND the data: acceptable on local[N],
    fatal for a multi-hour job on a 1000-executor cluster.
  * reliable ``checkpoint`` — blocks written to the configured checkpoint
    directory (HDFS/S3 on a cluster). Survives executor loss; the correct
    posture at 100 TB.

``truncate_lineage`` picks automatically: if the SparkContext has a
checkpoint dir configured (``sc.setCheckpointDir``), use reliable
checkpointing; otherwise fall back to localCheckpoint. Cluster deployments
opt in with one line at session setup — operator code stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut ``df``'s lineage, reliably when a checkpoint dir is configured."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
