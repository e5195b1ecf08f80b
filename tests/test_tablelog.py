"""Commit-log table format (sources/tablelog.py): the ACID-ish properties
the env-blocked table formats would provide, asserted directly."""

from __future__ import annotations

import json

from kinesis_test_spark.sources.tablelog import commit, live_files


def _touch(d, name):
    (d / name).write_bytes(b"x")


def test_uncommitted_files_are_invisible(tmp_path):
    _touch(tmp_path, "a.parquet")
    commit(tmp_path, adds=["a.parquet"], removes=[])
    _touch(tmp_path, "orphan.parquet")  # written, never committed
    assert live_files(tmp_path) == [str(tmp_path / "a.parquet")]


def test_remove_then_add_replays_in_order(tmp_path):
    for n in ("a.parquet", "b.parquet", "c.parquet"):
        _touch(tmp_path, n)
    commit(tmp_path, adds=["a.parquet", "b.parquet"], removes=[])
    commit(tmp_path, adds=["c.parquet"], removes=["a.parquet"])
    assert live_files(tmp_path) == sorted(
        [str(tmp_path / "b.parquet"), str(tmp_path / "c.parquet")]
    )


def test_time_travel_reads_log_prefix(tmp_path):
    _touch(tmp_path, "a.parquet")
    _touch(tmp_path, "b.parquet")
    v0 = commit(tmp_path, adds=["a.parquet"], removes=[])
    v1 = commit(tmp_path, adds=["b.parquet"], removes=["a.parquet"])
    assert v0 == 0 and v1 == 1
    assert live_files(tmp_path, version=0) == [str(tmp_path / "a.parquet")]
    assert live_files(tmp_path, version=1) == [str(tmp_path / "b.parquet")]
    assert live_files(tmp_path) == live_files(tmp_path, version=1)


def test_commit_publish_is_atomic_rename(tmp_path):
    """No partially-visible commit: the log dir only ever contains fully
    written .json files (tmp files are dot-prefixed and renamed)."""
    commit(tmp_path, adds=["a.parquet"], removes=[])
    entries = list((tmp_path / "_log").iterdir())
    assert [e.name for e in entries] == ["00000.json"]
    payload = json.loads(entries[0].read_text())
    assert payload["version"] == 0
    assert payload["actions"] == [{"op": "add", "file": "a.parquet"}]


def test_scratch_dir_concurrent_gc_rules(tmp_path, monkeypatch):
    """scratch_dir must never delete a LIVE foreign process's area (the
    bench-vs-suite collision), must GC dead owners' areas and its own."""
    import os

    from kinesis_test_spark.streaming import pipeline

    monkeypatch.setattr(pipeline, "SCRATCH_ROOT", tmp_path)
    base = tmp_path / "q"
    base.mkdir()
    (base / "1_liveforeign").mkdir()  # pid 1 is always alive
    (base / "999999999_dead").mkdir()  # beyond pid_max: dead
    (base / f"{os.getpid()}_mine_old").mkdir()
    d = pipeline.scratch_dir("q")
    assert d.exists() and d.name.startswith(f"{os.getpid()}_")
    names = {p.name for p in base.iterdir()}
    assert "1_liveforeign" in names  # live foreign area preserved
    assert "999999999_dead" not in names  # dead owner GC'd
    assert f"{os.getpid()}_mine_old" not in names  # own prior area GC'd


def test_stats_pruning_conservative_without_stats(tmp_path):
    """Files lacking stats must be conservatively INCLUDED in any prune."""
    from kinesis_test_spark.sources.tablelog import commit, files_maybe_containing

    _touch(tmp_path, "a.parquet")
    _touch(tmp_path, "b.parquet")
    commit(
        tmp_path,
        adds=[
            {"file": "a.parquet", "stats": {"user_id": [0, 9]}},
            "b.parquet",  # no stats recorded
        ],
        removes=[],
    )
    assert files_maybe_containing(tmp_path, "user_id", 50) == ["b.parquet"]
    assert files_maybe_containing(tmp_path, "user_id", 5) == [
        "a.parquet",
        "b.parquet",
    ]


def test_stats_survive_replay_and_rewrite(tmp_path):
    from kinesis_test_spark.sources.tablelog import (
        commit,
        files_maybe_containing,
        live_entries,
    )

    _touch(tmp_path, "a.parquet")
    _touch(tmp_path, "a2.parquet")
    commit(tmp_path, adds=[{"file": "a.parquet", "stats": {"user_id": [0, 9]}}], removes=[])
    commit(
        tmp_path,
        adds=[{"file": "a2.parquet", "stats": {"user_id": [0, 9]}}],
        removes=["a.parquet"],
    )
    entries = live_entries(tmp_path)
    assert [e["file"] for e in entries] == ["a2.parquet"]
    assert entries[0]["stats"] == {"user_id": [0, 9]}
    assert files_maybe_containing(tmp_path, "user_id", 3) == ["a2.parquet"]
