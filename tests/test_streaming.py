"""Streaming-semantics tests beyond oracle parity: arrival-order behaviors
(late-data drop, checkpoint resume) that batch SQL can't express."""

from __future__ import annotations

import pandas as pd

from kinesis_test_spark import registry

registry.load_all()


def test_watermark_drops_late_data(spark, sf_dir):
    """Phase-2 (older than watermark) events must not surface any window
    before the cutoff; the kept rows must undercount the full table."""
    out = registry.QUERIES["s_watermark"](spark, sf_dir).toPandas()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(out) > 0
    emitted = int(out["n"].sum())
    assert emitted < total  # late slice never counted
    lo = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "timestamp_micros(min(ts) div 1000) AS lo"
    ).first()["lo"]
    # no finalized window from the pre-cutoff (late) half of the timeline
    assert out["window_start"].min() > pd.Timestamp(lo)


def test_checkpoint_resume_exactly_once(spark, sf_dir):
    """After kill-and-resume, the sink holds each event exactly once."""
    out = registry.QUERIES["s_checkpoint"](spark, sf_dir).toPandas()
    src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(out) == src
    assert out["event_id"].nunique() == src


def test_dedup_removes_replay(spark, sf_dir):
    """Replaying the stream twice yields exactly one copy of each record."""
    out = registry.QUERIES["s_dedup"](spark, sf_dir).toPandas()
    src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(out) == src


def test_sink_layout_matches_reference(spark, sf_dir):
    """The sink must produce the reference's exact partition-dir naming:
    y=YYYY/m=M/d=D/h=H with month/day/hour NOT zero-padded
    (consumer.py:226-232)."""
    import re
    from pathlib import Path

    from kinesis_test_spark.streaming.pipeline import (
        partitioned_json_sink,
        read_events_stream,
        scratch_dir,
    )

    d = scratch_dir("layout_check")
    out = d / "out"
    partitioned_json_sink(read_events_stream(spark, sf_dir), out, d / "cp")
    leaf_dirs = {
        p.relative_to(out).as_posix()
        for p in Path(out).rglob("h=*")
        if p.is_dir()
    }
    assert leaf_dirs, "sink wrote no partition directories"
    pat = re.compile(r"^y=\d{4}/m=\d{1,2}/d=\d{1,2}/h=\d{1,2}$")
    assert all(pat.match(x) for x in leaf_dirs), sorted(leaf_dirs)[:5]
    # non-padded: single-digit components must not carry leading zeros
    assert not any(re.search(r"=(0\d)", x) for x in leaf_dirs), sorted(leaf_dirs)[:5]
