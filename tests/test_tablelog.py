"""Commit-log table format (sources/tablelog.py): the ACID-ish properties
the env-blocked table formats would provide, asserted directly."""

from __future__ import annotations

import json

from kinesis_test_spark.streaming.pipeline import local_rows
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
    written .json files (staging is dot-prefixed, published via
    atomic link-and-unlink)."""
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

    local_rows(spark, [(1,), (2,)], "x BIGINT").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "_t0"))
    next((tmp_path / "_t0").glob("part-*.parquet")).rename(tmp_path / "old.parquet")
    v0 = commit(tmp_path, adds=["old.parquet"], removes=[], schema=[["x", "BIGINT"]])
    local_rows(spark, [(3, "new")], "x BIGINT, y STRING").coalesce(
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

    land(local_rows(spark, [(1,), (2,)], "x BIGINT"), "a.parquet")
    v0 = commit(tmp_path, adds=["a.parquet"], removes=[], schema=[["x", "BIGINT"]])
    land(local_rows(spark, [(3, "n3")], "x BIGINT, y STRING"), "b.parquet")
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


# ---------------------------------------------------------------------------
# Concurrent writers — optimistic CAS commit protocol (VERDICT r8 #5).
# The pre-round-9 protocol published with rename(), which REPLACES an
# existing target on POSIX: two writers reading the same tip both landed
# "their" version and the loser's commit silently vanished. The CAS
# protocol claims a version with os.link (atomic fail-if-exists); the
# loser re-reads the tip and retries, so versions linearize and every
# writer's actions land exactly once.
# ---------------------------------------------------------------------------


def test_cas_loser_retries_and_lands_at_next_version(tmp_path, monkeypatch):
    """Deterministic injected race: a concurrent winner lands version 0
    between this writer's tip-read and its link. The loser must NOT
    clobber the winner, must re-serialize its entry against the new tip
    (the recorded "version" field moves too), and lands at version 1."""
    import os as _os
    from pathlib import Path as _Path

    import kinesis_test_spark.sources.tablelog as TL

    real_link = _os.link
    state = {"raced": False}

    def racy_link(src, dst):
        if not state["raced"]:
            state["raced"] = True
            _Path(dst).write_text(
                json.dumps(
                    {
                        "version": 0,
                        "actions": [{"op": "add", "file": "winner.parquet"}],
                    }
                )
            )
        return real_link(src, dst)

    monkeypatch.setattr(TL.os, "link", racy_link)
    v = commit(tmp_path, adds=["loser.parquet"], removes=[])
    assert state["raced"]
    assert v == 1
    # winner untouched, loser re-serialized at its landed version
    log = tmp_path / "_log"
    assert json.loads((log / "00000.json").read_text())["actions"] == [
        {"op": "add", "file": "winner.parquet"}
    ]
    assert json.loads((log / "00001.json").read_text())["version"] == 1
    assert sorted(f.rsplit("/", 1)[-1] for f in live_files(tmp_path)) == [
        "loser.parquet",
        "winner.parquet",
    ]


def _hammer(args):
    """One writer process: land n commits, return the versions claimed."""
    table_dir, writer, n = args
    from pathlib import Path

    from kinesis_test_spark.sources.tablelog import commit as _commit

    return [
        _commit(Path(table_dir), adds=[f"w{writer}_c{i}.parquet"], removes=[])
        for i in range(n)
    ]


def test_three_way_writer_race_linearizes(tmp_path):
    """3 writer PROCESSES x 15 commits against one table: all 45 commits
    land, versions are 0..44 contiguous with no gaps or double-claims,
    each writer's versions strictly increase, and the live set holds
    every writer's every file — no lost rows."""
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(3) as pool:
        results = pool.map(_hammer, [(str(tmp_path), w, 15) for w in range(3)])
    all_versions = sorted(v for versions in results for v in versions)
    assert all_versions == list(range(45))
    for versions in results:
        assert versions == sorted(versions)
    live = sorted(f.rsplit("/", 1)[-1] for f in live_files(tmp_path))
    assert live == sorted(
        f"w{w}_c{i}.parquet" for w in range(3) for i in range(15)
    )
    # on-disk log is exactly the 45 numbered commits — no stray tmps
    names = sorted(p.name for p in (tmp_path / "_log").iterdir())
    assert names == [f"{v:05d}.json" for v in range(45)]
    # each entry's recorded version matches its file name (re-serialized
    # on every retry, never stale)
    for name in names:
        entry = json.loads((tmp_path / "_log" / name).read_text())
        assert entry["version"] == int(name.split(".")[0])


def test_torn_writer_tmp_is_invisible_and_nonblocking(tmp_path):
    """A writer that dies before its link leaves only a dot-tmp: readers
    must not see it and the next writer must claim the version the dead
    writer was aiming at."""
    commit(tmp_path, adds=["a.parquet"], removes=[])
    log = tmp_path / "_log"
    (log / ".00001.9999.deadbeef.json.tmp").write_text(
        json.dumps({"version": 1, "actions": [{"op": "add", "file": "torn.parquet"}]})
    )
    assert [f.rsplit("/", 1)[-1] for f in live_files(tmp_path)] == ["a.parquet"]
    v = commit(tmp_path, adds=["b.parquet"], removes=[])
    assert v == 1
    assert sorted(f.rsplit("/", 1)[-1] for f in live_files(tmp_path)) == [
        "a.parquet",
        "b.parquet",
    ]


def test_batch_idempotence_survives_interleaved_foreign_commits(tmp_path):
    """Exactly-once replay detection must key on commit METADATA, not the
    version file name: under the CAS protocol a foreign writer
    (compaction, a second sink) can own the version number a batch id
    would map to — filename inference would then skip a never-landed
    batch (data loss) or re-land a committed one."""
    from kinesis_test_spark.sources.tablelog import batch_committed

    A = "cp://sink-a"
    commit(tmp_path, adds=["batch_0.parquet"], removes=[],
           meta={"batch_id": 0, "sink": A})
    commit(tmp_path, adds=["foreign.parquet"], removes=[])  # takes version 1
    # batch 1 has NOT landed even though 00001.json exists
    assert not batch_committed(tmp_path, 1, sink=A)
    commit(tmp_path, adds=["batch_1.parquet"], removes=[],
           meta={"batch_id": 1, "sink": A})
    assert batch_committed(tmp_path, 1, sink=A)
    assert batch_committed(tmp_path, 0, sink=A)
    assert not batch_committed(tmp_path, 2, sink=A)


def test_batch_idempotence_is_per_sink(tmp_path):
    """Batch ids are per QUERY: a second sink writing the same table (or
    a wiped-checkpoint successor) restarts its counter at 0 — its batch 0
    must NOT be mistaken for the first sink's batch 0 (that skip would be
    silent data loss), while its own replays still detect."""
    from kinesis_test_spark.sources.tablelog import batch_committed

    A, B = "cp://sink-a", "cp://sink-b"
    commit(tmp_path, adds=["a0.parquet"], removes=[],
           meta={"batch_id": 0, "sink": A})
    assert not batch_committed(tmp_path, 0, sink=B)  # B's batch 0 unlanded
    commit(tmp_path, adds=["b0.parquet"], removes=[],
           meta={"batch_id": 0, "sink": B})
    assert batch_committed(tmp_path, 0, sink=B)
    assert batch_committed(tmp_path, 0, sink=A)
    live = sorted(f.rsplit("/", 1)[-1] for f in live_files(tmp_path))
    assert live == ["a0.parquet", "b0.parquet"]
