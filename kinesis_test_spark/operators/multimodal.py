"""Multimodal columns: opaque binary payloads + typed metadata (NS mandate).

The pattern for image/audio/video at 100 TB: the payload travels as a
`binary` column next to typed metadata; decode / feature-extract runs as an
Arrow-batched `mapInPandas` over the binary column, emitting a typed schema.

The actual media decode is STUBBED here (image/audio libraries are not in
this container): `decode_batch` computes a deterministic fake
width/height/format from the payload bytes, and raises
`NotImplementedError` if a real codec is requested. Everything around the
stub — binary column handling, Arrow batch shape (pdf of bytes), schema
declaration, partition-preserving mapInPandas — is the real production
plumbing and is oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_test_spark.registry import query
from kinesis_test_spark.sources import t


@query(
    "q_multimodal",
    oracle="""
SELECT d.doc_id, d.lang, d.source, e.label,
       CAST(len(e.embedding) AS INT) AS dim,
       CAST(length(d.text) AS INT) AS payload_len,
       md5(d.text) AS payload_md5
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bundle text + embedding + metadata into one struct-typed multimodal
    column (text stands in for the opaque payload), then project typed
    fields back out — the schema shape a mixed-modality training table uses."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    bundled = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.encode("text", "UTF-8").alias("payload"),
            F.col("embedding"),
            F.struct("lang", "source", "n_chars", "label").alias("meta"),
        ).alias("content"),
    )
    return bundled.select(
        "doc_id",
        F.col("content.meta.lang").alias("lang"),
        F.col("content.meta.source").alias("source"),
        F.col("content.meta.label").alias("label"),
        F.size("content.embedding").alias("dim"),
        F.octet_length("content.payload").alias("payload_len"),
        F.md5("content.payload").alias("payload_md5"),
    )


DECODE_SCHEMA = "doc_id bigint, payload_len int, width int, height int, format string"


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode' over binary payloads.

    Deterministic fake decode: dimensions derived from payload length.
    A real codec slots in here unchanged (bytes in → typed columns out).
    """
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_len": n.astype("int32"),
                "width": (n % 64).astype("int32"),
                "height": ((n * 7) % 64).astype("int32"),
                "format": "fake/v1",
            }
        )


def decode_batch_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real media decode — requires PIL/ffmpeg, not present in this build."""
    raise NotImplementedError(
        "real image/audio decode needs codec libraries; use decode_batch "
        "(deterministic stub) — the Spark plumbing is identical"
    )


@query(
    "q_mm_decode",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INT) AS payload_len,
       CAST(length(text) % 64 AS INT) AS width,
       CAST((length(text) * 7) % 64 AS INT) AS height,
       'fake/v1' AS format
FROM documents
""",
)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline: documents → binary payload column →
    Arrow batches → typed (width, height, format) rows. The oracle states
    the stub's arithmetic directly — proving the Spark-side plumbing
    (binary handling, batch iteration, schema) end to end."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(decode_batch, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling stub: one row per 'frame', count derived from payload
    length (a real video decoder yields the same shape: doc_id × frame)."""
    import hashlib

    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) % 5 + 1
            for i in range(1, n_frames + 1):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(i)
                rows["frame_md5"].append(
                    hashlib.md5(payload + b":" + str(i).encode()).hexdigest()
                )
        out = pd.DataFrame(rows)
        out["frame_idx"] = out["frame_idx"].astype("int32")
        yield out


@query(
    "q_mm_frames",
    oracle="""
WITH nums AS (SELECT unnest(generate_series(1, 5)) AS i)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       md5(text || ':' || CAST(i AS VARCHAR)) AS frame_md5
FROM documents, nums
WHERE i <= length(text) % 5 + 1
""",
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-payload→many-frames via mapInPandas (the video frame-sampling
    shape): binary in, typed frame rows out, row count data-dependent."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(frame_sample_batch, schema=FRAME_SCHEMA)


def decode_batch_arrow(batches):
    """Same decode stub at the Arrow layer (mapInArrow): zero pandas
    overhead, RecordBatch in → RecordBatch out. The right extension point
    when the payload transform is itself Arrow-native (tokenizers, image
    libs with Arrow bindings)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        n = pc.binary_length(batch.column("payload")).to_numpy()  # zero-copy ints
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pa.array((n).astype("int32")),
                pa.array((n % 64).astype("int32")),
                pa.array(((n.astype("int64") * 7) % 64).astype("int32")),
                pa.array(["fake/v1"] * batch.num_rows),
            ],
            names=["doc_id", "payload_len", "width", "height", "format"],
        )


@query(
    "q_mm_decode_arrow",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INT) AS payload_len,
       CAST(length(text) % 64 AS INT) AS width,
       CAST((length(text) * 7) % 64 AS INT) AS height,
       'fake/v1' AS format
FROM documents
""",
)
def q_mm_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow variant of the decode pipeline — same contract as
    q_mm_decode, RecordBatch-level (no pandas materialization)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInArrow(decode_batch_arrow, schema=DECODE_SCHEMA)
