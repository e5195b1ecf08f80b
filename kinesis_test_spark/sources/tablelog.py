"""Minimal commit-log table format (Iceberg/Delta mechanics without the
jar): numbered JSON commits list add/remove file actions; a snapshot read
replays the log to a version and scans exactly the live files.

This is the metadata discipline the environment-blocked table formats
provide (no Delta/Iceberg jar here — re-probed every round):

  * atomic visibility — a data file becomes readable only when a commit
    names it; half-written or abandoned files are invisible
  * snapshot isolation / time travel — ``live_files(dir, version=k)``
    replays the prefix of the log, so any historical version is readable
  * delete/compact as rewrite — actions remove old files and add rewritten
    ones; storage stays append-only

The log replay is driver-side and METADATA-sized (versions × files per
commit) — the same design point as the real formats, whose drivers also
replay JSON/avro metadata before planning the scan. The data path stays
fully distributed: the snapshot is just an explicit file list handed to
the parquet reader.
"""

from __future__ import annotations

import json
import os
import random
import time
import uuid
from pathlib import Path

LOG_DIR = "_log"

# Bound on CAS retries under writer contention. Each loss means SOME
# commit landed (any writer — a tight committer loop can win many rounds
# in a row, so the bound is NOT writers-1); jittered backoff below makes
# repeated losses progressively unlikely, and the bound turns a
# filesystem that lies about link(2) exclusivity — or pathological
# starvation — into a loud CommitConflict instead of a livelock.
COMMIT_MAX_RETRIES = 64


class CommitConflict(RuntimeError):
    """Raised when a commit cannot claim a version after retries."""


def commit(
    table_dir: Path,
    adds: list,
    removes: list[str],
    schema: list[list[str]] | None = None,
    meta: dict | None = None,
) -> int:
    """Append the next commit; returns the version number it LANDED at.

    An add is a file name, or a dict ``{"file": name, "stats": {col:
    [min, max]}}`` — per-file column stats travel IN the metadata (the
    Iceberg manifest design), so a planner can prune files without
    touching data.

    ``schema`` (a list of [column, DDL type] pairs) records the table
    schema AS OF this commit — the Iceberg schema-evolution mechanic:
    the reader projects every file through the committed schema, so data
    files written before an added column serve NULL for it, and a
    time-travel read of an older version sees the older schema. A commit
    without ``schema`` leaves the schema unchanged.

    Concurrency — optimistic, compare-and-swap (the Delta/Iceberg commit
    protocol): the writer reads the current tip, stages the entry under a
    WRITER-UNIQUE dot-tmp name (two racers must never share a staging
    file), and claims the version with ``os.link`` — atomic
    fail-if-exists on POSIX, unlike ``rename``, which silently REPLACES
    an existing file (the pre-round-9 protocol: two racing writers both
    computed the same version and the loser's commit vanished). The
    loser re-reads the tip and retries against the next version, so
    versions linearize, every writer's actions land exactly once, and no
    torn state is ever visible: a crash before the link leaves only an
    invisible dot-tmp; the link itself is all-or-nothing.

    ``meta``: free-form writer metadata recorded IN the entry (e.g. a
    streaming sink's ``{"batch_id": n}``). Under concurrent writers a
    commit's VERSION is decided by the race, so idempotence must never
    be inferred from version numbers — replay detection reads the log
    for the metadata (``batch_committed``), not the file name."""
    log = Path(table_dir) / LOG_DIR
    log.mkdir(parents=True, exist_ok=True)
    actions = [
        {"op": "add", **(a if isinstance(a, dict) else {"file": a})} for a in adds
    ] + [{"op": "remove", "file": f} for f in removes]
    for attempt in range(COMMIT_MAX_RETRIES):
        version = len(list(log.glob("*.json")))
        entry: dict = {"version": version, "actions": actions}
        if schema is not None:
            entry["schema"] = schema
        if meta is not None:
            entry["meta"] = meta
        tmp = log / f".{version:05d}.{os.getpid()}.{uuid.uuid4().hex}.json.tmp"
        tmp.write_text(json.dumps(entry, indent=1))
        try:
            os.link(tmp, log / f"{version:05d}.json")  # atomic CAS publish
            return version
        except FileExistsError:
            # Lost the race — another commit (any writer, including a
            # faster loop of one neighbor) landed this version. Jittered
            # backoff breaks the lockstep where one writer loses every
            # round to a tight committer loop; without it the retry bound
            # is a liveness ceiling, not just a fail-fast on a broken fs.
            time.sleep(random.uniform(0, min(0.05, 0.002 * (attempt + 1))))
            continue
        finally:
            tmp.unlink(missing_ok=True)
    raise CommitConflict(
        f"could not claim a commit version after {COMMIT_MAX_RETRIES} attempts"
    )


# Per-(table, sink) incremental scan state: (log fingerprint, highest
# version parsed, batch_ids seen for that sink). Commits are immutable and
# versions dense, so a JSON file never needs parsing twice per process —
# the common MISS case (a never-before-seen batch id) costs O(commits
# since last call) instead of O(total commits) per micro-batch (O(n²) over
# a sink's lifetime; r9 ADVICE).
_BATCH_SCAN_CACHE: dict[tuple[str, str], tuple[tuple, int, set[int]]] = {}


def _log_fingerprint(log: Path) -> tuple:
    """Identity of THIS log incarnation: the (device, inode, mtime_ns) of
    the version-0 commit file. Commit files are created once by the
    os.link CAS and never rewritten, so the triple is stable for a live
    log but changes when the log is deleted and recreated at the same
    path — even if the new log grows back to >= the cached tip with dense
    versions, which the version-count density check alone cannot see
    (r10 ADVICE: a stale `seen` set would report a batch as committed
    that the new log never recorded — a silently lost batch)."""
    try:
        st = (log / f"{0:05d}.json").stat()
    except OSError:
        return ()
    return (st.st_dev, st.st_ino, st.st_mtime_ns)


def batch_committed(table_dir: Path, batch_id: int, sink: str) -> bool:
    """True iff some commit in the log records this ``(sink, batch_id)``
    — the replay-detection primitive for exactly-once streaming sinks.

    ``sink`` namespaces the batch counter: batch ids are PER QUERY (two
    sinks writing one table both start at 0, and a wiped checkpoint
    restarts the count), so a bare batch_id collides across writers and
    would skip a never-landed batch. Use a stable per-query identity —
    the checkpoint path is the natural one (same query ⇒ same
    checkpoint; a NEW checkpoint is a new logical query and must be a
    new sink identity).

    Incremental: each call parses only commits newer than the last call's
    tip (commit files are immutable once linked, versions are dense), and
    answers from the per-sink cache. A log whose version-≤-tip prefix no
    longer has tip+1 files was recreated under the same path (test rigs)
    — the cache entry resets and the log rescans from zero. Foreign
    writers' commits interleave fine: they are parsed once and simply
    don't match this sink."""
    log = Path(table_dir) / LOG_DIR
    key = (os.path.abspath(str(table_dir)), sink)
    fp = _log_fingerprint(log)
    cached_fp, last, seen = _BATCH_SCAN_CACHE.get(key, ((), -1, set()))
    if fp != cached_fp:
        last, seen = -1, set()
    paths = sorted(log.glob("*.json"))
    if sum(1 for p in paths if int(p.stem) <= last) != last + 1:
        last, seen = -1, set()
    for path in paths:
        v = int(path.stem)
        if v <= last:
            continue
        entry = json.loads(path.read_text())
        meta = entry.get("meta", {})
        if meta.get("sink") == sink and "batch_id" in meta:
            seen.add(meta["batch_id"])
        last = v
    # Store the PRE-scan fingerprint: if the log was recreated mid-scan,
    # the next call's fresh stat mismatches and forces a rescan. (Storing
    # a post-scan stat could pair the NEW log's identity with the OLD
    # log's seen set — exactly the stale-cache bug the fingerprint kills.)
    _BATCH_SCAN_CACHE[key] = (fp, last, seen)
    return batch_id in seen


def live_entries(table_dir: Path, version: int | None = None) -> list[dict]:
    """Replay the commit log (to `version` inclusive; None = latest) and
    return the live add-actions (file + any stats), sorted by file name."""
    log = Path(table_dir) / LOG_DIR
    live: dict[str, dict] = {}
    for path in sorted(log.glob("*.json")):
        entry = json.loads(path.read_text())
        if version is not None and entry["version"] > version:
            break
        for action in entry["actions"]:
            if action["op"] == "add":
                live[action["file"]] = action
            elif action["op"] == "remove":
                live.pop(action["file"], None)
    return [live[f] for f in sorted(live)]


def live_files(table_dir: Path, version: int | None = None) -> list[str]:
    """Live data-file paths at `version` (None = latest), sorted for
    deterministic planning."""
    return [
        str(Path(table_dir) / e["file"]) for e in live_entries(table_dir, version)
    ]


def table_schema(table_dir: Path, version: int | None = None) -> list | None:
    """The committed table schema at ``version`` (None = latest): the most
    recent schema-carrying commit in the replayed prefix wins. None if no
    commit ever declared one (a stats-only / pre-evolution table)."""
    log = Path(table_dir) / LOG_DIR
    schema = None
    for path in sorted(log.glob("*.json")):
        entry = json.loads(path.read_text())
        if version is not None and entry["version"] > version:
            break
        if "schema" in entry:
            schema = entry["schema"]
    return schema


def schema_ddl(table_dir: Path, version: int | None = None) -> str | None:
    """The committed schema rendered as a Spark DDL string for
    ``spark.read.schema(...)`` — the projection that makes pre-evolution
    files serve NULL for later-added columns."""
    schema = table_schema(table_dir, version)
    if schema is None:
        return None
    return ", ".join(f"{name} {ddl_type}" for name, ddl_type in schema)


def files_maybe_containing(table_dir: Path, col: str, value) -> list[str]:
    """Metadata-only pruning: live file names whose [min, max] stats for
    `col` admit `value` — files WITHOUT stats are conservatively included
    (the planner must never prune on absent information)."""
    hits = []
    for entry in live_entries(table_dir):
        stats = entry.get("stats", {}).get(col)
        if stats is None or stats[0] <= value <= stats[1]:
            hits.append(entry["file"])
    return hits
