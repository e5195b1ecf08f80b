"""Batch table sources.

The reference's scan path is `get_records` → JSON decode
(`/root/reference/consumer.py:115-130`); here the batch analogue is the
vectorized Parquet reader with Catalyst column pruning + predicate pushdown
— callers just ``select``/``filter`` and the scan narrows itself (verify
with ``plans.scan_info``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Dtype-adaptive `events.ts` → session-TZ TIMESTAMP (a UTC instant).

    The driver has regenerated the events fixture with different parquet
    timestamp encodings across rounds, so we dispatch on the scanned type
    instead of hard-coding one ingestion contract:

    - TIMESTAMP(NANOS): Spark has no nanos type; with
      `spark.sql.legacy.parquet.nanosAsLong` it scans as LongType that we
      floor-truncate to a µs timestamp — exactly what DuckDB/Arrow do when
      reading the same file, so oracle comparisons line up.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): scans as TIMESTAMP_NTZ; the
      session TZ is pinned UTC, so casting NTZ→TIMESTAMP is
      instant-preserving and matches DuckDB's naive-TIMESTAMP read.
    - TIMESTAMP(MICROS, isAdjustedToUTC=true): already TIMESTAMP — no-op.
    """
    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        # NTZ→LTZ casts re-interpret the wall clock in the SESSION timezone:
        # on a non-UTC session every instant would silently shift relative to
        # DuckDB's naive read. Fail loudly instead of corrupting quietly (the
        # nanos path never had this hazard — it was TZ-independent).
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise ValueError(
                f"normalize_ts: events.ts is TIMESTAMP_NTZ and the session "
                f"timezone is {tz!r}; the NTZ->TIMESTAMP cast is only "
                f"instant-preserving under UTC. Set "
                f"spark.sql.session.timeZone=UTC (the session factory and "
                f"driver wrappers do this) before loading events."
            )
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def events_until(spark: SparkSession, sf_dir: str, cutoff: str) -> DataFrame:
    """events with ``ts <= cutoff`` applied in the RAW scan dtype domain.

    ``t(...).filter(ts <= cutoff)`` compares the normalize_ts-DERIVED column
    (timestamp_micros(ts div 1000) on nanos fixtures, an NTZ cast on micros
    ones), so the predicate can never reach the parquet reader. Here the
    cutoff is translated into the scanned type BEFORE normalization —
    nanos-long fixtures get ``ts <= cutoff_µs·1000 + 999`` (identical row
    set to floor-truncated µs ≤ cutoff), NTZ fixtures an NTZ literal — so
    it lands in PushedFilters and future row groups are min/max-skipped at
    the scan. ``cutoff`` must be 'YYYY-MM-DD HH:MM:SS' (UTC, whole seconds).
    Semantically identical to filtering after normalize_ts under every
    fixture encoding (pinned by tests/test_ts_encoding.py).
    """
    cutoff_dt = datetime.datetime.strptime(cutoff, "%Y-%m-%d %H:%M:%S").replace(
        tzinfo=datetime.timezone.utc
    )
    cutoff_micros = int(cutoff_dt.timestamp()) * 1_000_000
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = raw.schema["ts"].dataType
    if isinstance(dt, LongType):
        raw = raw.filter(F.col("ts") <= F.lit(cutoff_micros * 1000 + 999))
    elif isinstance(dt, TimestampNTZType):
        raw = raw.filter(F.col("ts") <= F.lit(cutoff).cast("timestamp_ntz"))
    else:
        raw = raw.filter(F.col("ts") <= F.lit(cutoff).cast("timestamp"))
    return normalize_ts(raw)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan; pruning/pushdown left to Catalyst.

    `events.ts` is normalized to a proper timestamp whatever the fixture's
    parquet encoding — see `normalize_ts`.
    """
    if name not in TABLES:
        raise KeyError(name)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_ts(df)
    return df


def unique_docs(
    spark: SparkSession,
    sf_dir: str,
    cols: list[str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """One row per document IDENTITY (oracle mirror: SELECT DISTINCT ...
    FROM documents WHERE doc_id IS NOT NULL). At-least-once delivery
    redelivers byte-identical rows (reference analog: consumer.py:292-303
    dedups by sequence number), and a doc-grain operator — shingling,
    tokenizing, a codec formula keyed on doc_id — must process each
    identity ONCE, not once per redelivery (tests/test_edge_dupkeys.py:
    duplicated rows doubled shingle multisets, token streams, and
    formula sums asymmetrically). The Spark side dedups on doc_id alone
    (one row per identity) while the SQL mirror is a full-tuple
    DISTINCT; the pair is equivalent ONLY under the contract that
    same-id redeliveries are byte-identical — mutated same-id rows are
    out of contract (identity is the id — arrival order decides, which
    no batch oracle can state). NOTE: a new documents column must be
    added to SQL_UNIQUE_DOCS's column list or the mirror silently drops
    it while the Spark side carries it. Identity-LESS rows
    (NULL doc_id — schema-legal) are quarantined explicitly: Spark's
    dropDuplicates would collapse two DIFFERENT unknown-identity docs
    into one arbitrary row where SQL DISTINCT keeps both — a doc-grain
    operator cannot key rows that have no key.

    ``cols`` prunes the projection before the dedup (pushdown into the
    scan); ``partitions`` repartitions on doc_id FIRST so the dedup
    aggregate and any downstream doc_id-keyed stage reuse one exchange
    (the CPU-heavy codec/shingle pipelines pass this — single-row-group
    test fixtures give one scan task otherwise)."""
    df = t(spark, sf_dir, "documents")
    if cols is not None:
        df = df.select(*cols)
    df = df.filter(F.col("doc_id").isNotNull())
    if partitions is not None:
        df = df.repartition(partitions, "doc_id")
    return df.dropDuplicates(["doc_id"])


# Oracle-side mirror of ``unique_docs`` — interpolate as the FROM source
# in any doc-grain oracle.
SQL_UNIQUE_DOCS = (
    "(SELECT DISTINCT doc_id, text, lang, source, n_chars FROM documents"
    " WHERE doc_id IS NOT NULL)"
)


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLES}


def views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based operators)."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
