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
from pathlib import Path

LOG_DIR = "_log"


def commit(table_dir: Path, adds: list[str], removes: list[str]) -> int:
    """Append the next commit; returns the new version number."""
    log = Path(table_dir) / LOG_DIR
    log.mkdir(parents=True, exist_ok=True)
    version = len(list(log.glob("*.json")))
    actions = [{"op": "add", "file": f} for f in adds] + [
        {"op": "remove", "file": f} for f in removes
    ]
    payload = json.dumps({"version": version, "actions": actions}, indent=1)
    tmp = log / f".{version:05d}.json.tmp"
    tmp.write_text(payload)
    tmp.rename(log / f"{version:05d}.json")  # atomic publish
    return version


def live_files(table_dir: Path, version: int | None = None) -> list[str]:
    """Replay the commit log (to `version` inclusive; None = latest) and
    return the live data-file paths, sorted for deterministic planning."""
    log = Path(table_dir) / LOG_DIR
    live: set[str] = set()
    for path in sorted(log.glob("*.json")):
        entry = json.loads(path.read_text())
        if version is not None and entry["version"] > version:
            break
        for action in entry["actions"]:
            if action["op"] == "add":
                live.add(action["file"])
            elif action["op"] == "remove":
                live.discard(action["file"])
    return sorted(str(Path(table_dir) / f) for f in live)
