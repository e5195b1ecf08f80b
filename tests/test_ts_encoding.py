"""Fixture-encoding portability pins for events.ts.

Round 4 was lost to a driver-side change of the events fixture's parquet
timestamp encoding (TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ)); ingestion
now dispatches on the scanned dtype (sources/tables.normalize_ts). These
tests restage the SAME events rows under all three encodings the parquet
format can carry — nanos (scans as long under nanosAsLong), micros-NTZ
(scans as TIMESTAMP_NTZ), micros-UTC-adjusted (scans as TIMESTAMP) — and
pin that every encoding yields identical query results, so the next
fixture flip is a no-op instead of a 95-query outage.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis_test_spark import registry
from kinesis_test_spark.sources.tables import TABLES

registry.load_all()

# Events-reading keys spanning the families the ts break took down in r4:
# direct scan+derive, date functions, sessionization, as-of join, windowed
# rollup. (Streaming keys exercise the same normalize_ts via the staged
# readers, covered by tests/test_streaming.py.)
PROBE_KEYS = [
    "q_time_partition_key",
    "q_fn_date",
    "q_sessionize",
    "q_time_rollup",
    # encoding-sensitive cutoff comparison (events_until translates the
    # leakage cutoff into the raw scanned dtype) + the expectation suite
    "q_feature_snapshot",
    "q_dq_checks",
    # round-6 events consumers with timestamp-literal comparisons
    "q_cdc_changes",
    "q_compaction_planner",
    # round-7: the TTL sessionizer converts ts to epoch-ms inside the
    # stateful update and stages raw-domain sentinels — both dispatch on
    # the scanned encoding, so the whole pipeline must be invariant
    "s_state_ttl",
]

ENCODINGS = ["nanos", "micros_ntz", "micros_utc"]


@pytest.fixture(scope="module")
def encoded_dirs(spark, sf_dir, tmp_path_factory):
    """One staged sf_dir per ts encoding: events restaged, other tables
    symlinked to the originals."""
    base = tmp_path_factory.mktemp("ts_enc")
    events = pq.read_table(f"{sf_dir}/events.parquet")
    ts_idx = events.schema.get_field_index("ts")
    col = events.column("ts")
    # canonical instant list in µs, whatever the source fixture carries
    if pa.types.is_integer(col.type):  # already long nanos
        us = pa.compute.divide(col, 1000).cast(pa.timestamp("us"))
    else:
        us = col.cast(pa.timestamp("us"))
    variants = {
        "nanos": us.cast(pa.timestamp("ns")),
        "micros_ntz": us,
        "micros_utc": us.cast(pa.timestamp("us", tz="UTC")),
    }
    dirs: dict[str, str] = {}
    for name, ts_col in variants.items():
        d = base / name
        d.mkdir()
        field = pa.field("ts", ts_col.type, events.schema.field(ts_idx).nullable)
        pq.write_table(
            events.set_column(ts_idx, field, ts_col),
            d / "events.parquet",
            store_schema=False,
        )
        for t in TABLES:
            if t != "events":
                (d / f"{t}.parquet").symlink_to(Path(sf_dir) / f"{t}.parquet")
        dirs[name] = str(d)
    yield dirs
    shutil.rmtree(base, ignore_errors=True)


def test_encodings_scan_as_expected(spark, encoded_dirs):
    """The staged files really do carry three different raw dtypes."""
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    expected = {
        "nanos": LongType,
        "micros_ntz": TimestampNTZType,
        "micros_utc": TimestampType,
    }
    for name, d in encoded_dirs.items():
        dt = spark.read.parquet(f"{d}/events.parquet").schema["ts"].dataType
        assert isinstance(dt, expected[name]), (name, dt)


@pytest.mark.parametrize("key", PROBE_KEYS)
def test_identical_results_across_encodings(spark, encoded_dirs, key):
    """Every encoding must produce byte-identical query output."""
    results = {}
    for name, d in encoded_dirs.items():
        pdf = registry.QUERIES[key](spark, d).toPandas()
        results[name] = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    ref = results["micros_ntz"]
    for name in ENCODINGS:
        assert results[name].equals(ref), (
            key,
            name,
            results[name].compare(ref).head() if len(results[name]) == len(ref) else
            (len(results[name]), len(ref)),
        )


def test_streaming_drain_identical_across_encodings(spark, encoded_dirs):
    """read_events_stream / events_schema must normalize every encoding:
    the tumbling-window drain is compared across all three stagings."""
    results = {}
    for name, d in encoded_dirs.items():
        pdf = registry.QUERIES["s_tumbling"](spark, d).toPandas()
        results[name] = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    ref = results["micros_ntz"]
    for name in ENCODINGS:
        assert results[name].equals(ref), (name, len(results[name]), len(ref))


def test_watermark_split_long_nanos_branch(spark, encoded_dirs):
    """s_watermark's timeline split has a dedicated long-nanos arm
    (isinstance(lo, int)) that the current micros fixture never executes —
    run it against the nanos staging and assert the late-drop invariants."""
    out = registry.QUERIES["s_watermark"](spark, encoded_dirs["nanos"]).toPandas()
    total = spark.read.parquet(f"{encoded_dirs['nanos']}/events.parquet").count()
    assert len(out) > 0
    assert int(out["n"].sum()) < total  # late slice never counted


def test_sentinel_staging_long_nanos_branch(spark, encoded_dirs):
    """s_stream_join_left stages far-future sentinels in the RAW ts domain;
    exercise the integer-nanos arm of stage_sentinel and assert the stream
    fully drains (every click exactly once — matched or NULL-extended)."""
    out = registry.QUERIES["s_stream_join_left"](spark, encoded_dirs["nanos"]).toPandas()
    ev = spark.read.parquet(f"{encoded_dirs['nanos']}/events.parquet")
    n_clicks = ev.filter("event_type = 'click'").count()
    assert out["click_id"].nunique() == n_clicks


def test_ntz_requires_utc_session_loudly(spark, encoded_dirs):
    """A non-UTC session must FAIL the NTZ ingestion, not silently shift
    every instant (the nanos path was TZ-independent; the NTZ cast is not)."""
    import pytest as _pytest

    from kinesis_test_spark.sources.tables import t as load_t

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        with _pytest.raises(ValueError, match="instant-preserving under UTC"):
            load_t(spark, encoded_dirs["micros_ntz"], "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
