"""Shared adversarial-corpus staging rig.

ONE copy of the encoding-adaptive events append: the fixture's ts column
has shipped as TIMESTAMP(MICROS, NTZ), TIMESTAMP(NANOS) and
nanos-as-int64 across regenerations (CLAUDE.md gotcha — the round-4
regen broke 95 keys at analysis time), so every planter must stage new
rows in whatever encoding the CURRENT parquet carries. Before round 9
this dispatch block lived verbatim in three test files; a regen that
changes the encoding again must be absorbed HERE, once.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

EVENT_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def append_events(dest: Path, rows: dict) -> None:
    """Append planted rows to ``dest/events.parquet``.

    ``rows``: dict of column-name -> list, with ``ts`` given in
    MICROSECONDS since the epoch (ints); the write adapts to the scanned
    schema's encoding (int64 nanos vs timestamp)."""
    ev = pq.read_table(dest / "events.parquet")
    ts_type = ev.schema.field("ts").type
    if pa.types.is_integer(ts_type):
        # None-safe: the NULL-ts corpus class stages through here too
        ts_arr = pa.array(
            [v * 1000 if v is not None else None for v in rows["ts"]],
            type=ts_type,
        )
    else:
        ts_arr = pa.array(rows["ts"], type=pa.timestamp("us")).cast(ts_type)
    extra = pa.table(
        {
            "event_id": pa.array(rows["event_id"], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array(rows["user_id"], type=pa.int64()),
            "event_type": rows["event_type"],
            "value": pa.array(rows["value"], type=pa.float64()),
            "props": rows["props"],
        },
        schema=ev.schema,
    )
    pq.write_table(pa.concat_tables([ev, extra]), dest / "events.parquet")
