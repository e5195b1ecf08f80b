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


def test_schema_evolution_versioned(tmp_path):
    """Schema is a COMMIT-level fact: the latest schema-carrying commit in
    the replayed prefix wins, time travel sees the older schema, and a
    commit without a schema leaves it unchanged."""
    from kinesis_test_spark.sources.tablelog import commit, schema_ddl, table_schema

    _touch(tmp_path, "a.parquet")
    _touch(tmp_path, "b.parquet")
    _touch(tmp_path, "c.parquet")
    v0 = commit(
        tmp_path, adds=["a.parquet"], removes=[], schema=[["x", "BIGINT"]]
    )
    v1 = commit(
        tmp_path,
        adds=["b.parquet"],
        removes=[],
        schema=[["x", "BIGINT"], ["y", "STRING"]],
    )
    v2 = commit(tmp_path, adds=["c.parquet"], removes=[])  # no schema change
    assert table_schema(tmp_path, version=v0) == [["x", "BIGINT"]]
    assert table_schema(tmp_path, version=v1) == [["x", "BIGINT"], ["y", "STRING"]]
    assert table_schema(tmp_path, version=v2) == table_schema(tmp_path)
    assert schema_ddl(tmp_path, version=v0) == "x BIGINT"
    assert schema_ddl(tmp_path) == "x BIGINT, y STRING"


def test_schema_evolution_nulls_for_pre_evolution_files(spark, tmp_path):
    """Reading through the committed schema serves NULL for a column added
    AFTER a file was written — no rewrite of old data — and a v0
    time-travel read projects the original narrow schema."""
    from kinesis_test_spark.sources.tablelog import commit, live_files, schema_ddl

    spark.createDataFrame([(1,), (2,)], "x BIGINT").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "_t0"))
    next((tmp_path / "_t0").glob("part-*.parquet")).rename(tmp_path / "old.parquet")
    v0 = commit(tmp_path, adds=["old.parquet"], removes=[], schema=[["x", "BIGINT"]])
    spark.createDataFrame([(3, "new")], "x BIGINT, y STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "_t1"))
    next((tmp_path / "_t1").glob("part-*.parquet")).rename(tmp_path / "new.parquet")
    commit(
        tmp_path,
        adds=["new.parquet"],
        removes=[],
        schema=[["x", "BIGINT"], ["y", "STRING"]],
    )
    latest = (
        spark.read.schema(schema_ddl(tmp_path))
        .parquet(*live_files(tmp_path))
        .orderBy("x")
        .collect()
    )
    assert [(r.x, r.y) for r in latest] == [(1, None), (2, None), (3, "new")]
    v0_read = (
        spark.read.schema(schema_ddl(tmp_path, version=v0))
        .parquet(*live_files(tmp_path, version=v0))
        .orderBy("x")
        .collect()
    )
    assert [tuple(r) for r in v0_read] == [(1,), (2,)]
    assert v0_read[0].asDict().keys() == {"x"}


def test_evolve_then_compact_preserves_time_travel(spark, tmp_path):
    """The evolution × compaction interaction: compaction rewrites live
    files THROUGH the committed (evolved) schema, the rewrite is a logical
    remove (bytes stay on disk), so time travel still serves every earlier
    version — pre-compaction reads reconstruct from the original files and
    a pre-evolution read still projects the narrow schema. This is the
    sequence a production table hits first: add a column, then the nightly
    compactor runs."""
    from kinesis_test_spark.sources.tablelog import commit, live_files, schema_ddl

    def land(df, name):
        tmp = tmp_path / f"_t_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        next(tmp.glob("part-*.parquet")).rename(tmp_path / name)

    land(spark.createDataFrame([(1,), (2,)], "x BIGINT"), "a.parquet")
    v0 = commit(tmp_path, adds=["a.parquet"], removes=[], schema=[["x", "BIGINT"]])
    land(spark.createDataFrame([(3, "n3")], "x BIGINT, y STRING"), "b.parquet")
    v1 = commit(
        tmp_path,
        adds=["b.parquet"],
        removes=[],
        schema=[["x", "BIGINT"], ["y", "STRING"]],
    )
    # compact: read live files through the COMMITTED schema, rewrite as one
    compacted = spark.read.schema(schema_ddl(tmp_path)).parquet(
        *live_files(tmp_path)
    )
    land(compacted, "c.parquet")
    v2 = commit(tmp_path, adds=["c.parquet"], removes=["a.parquet", "b.parquet"])

    def rows(version):
        return sorted(
            (r.x, r.y)
            for r in spark.read.schema(schema_ddl(tmp_path, version=version))
            .parquet(*live_files(tmp_path, version=version))
            .collect()
        )

    # latest: single compacted file, full content, NULL backfill intact
    assert live_files(tmp_path, version=v2) == [str(tmp_path / "c.parquet")]
    assert rows(v2) == [(1, None), (2, None), (3, "n3")]
    # pre-compaction: same logical content from the ORIGINAL files
    assert rows(v1) == rows(v2)
    assert len(live_files(tmp_path, version=v1)) == 2
    # pre-evolution: narrow schema — no y column at all
    v0_rows = (
        spark.read.schema(schema_ddl(tmp_path, version=v0))
        .parquet(*live_files(tmp_path, version=v0))
        .collect()
    )
    assert sorted(r.x for r in v0_rows) == [1, 2]
    assert v0_rows[0].asDict().keys() == {"x"}
    # the remove was logical: every historical byte is still on disk
    assert (tmp_path / "a.parquet").exists() and (tmp_path / "b.parquet").exists()


def test_gdpr_delete_is_noop_when_target_outside_domain(spark, tmp_path):
    """q_table_gdpr must treat 'no file range can contain the target' as a
    metadata no-op delete, whatever the reason — review finding: the first
    empty-input fix keyed the branch on TABLE emptiness, so a non-empty
    table whose user-id domain excludes GDPR_TARGET_USER (here: ids capped
    below 7) still hit `assert len(affected) == 1`."""
    import pyarrow.parquet as pq

    from kinesis_test_spark import registry
    from kinesis_test_spark.sources.formats import GDPR_TARGET_USER

    registry.load_all()
    src = "/root/testdata/sf0.001"
    d = tmp_path / "small_domain"
    d.mkdir()
    for f in __import__("pathlib").Path(src).glob("*.parquet"):
        t = pq.read_table(f)
        if f.name == "events.parquet":
            import pyarrow.compute as pc

            t = t.filter(pc.less(t["user_id"], GDPR_TARGET_USER))
            assert t.num_rows > 0  # non-empty, but target absent
        pq.write_table(t, d / f.name)
    # nothing was deleted: the aggregate equals the oracle over the full
    # (capped) table — and the rig must not crash on affected == []
    from kinesis_test_spark.oracle import check_query

    problems = check_query(spark, str(d), "q_table_gdpr")
    assert not problems, "; ".join(problems)
