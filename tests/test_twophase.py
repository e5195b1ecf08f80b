"""Two-phase (skew-safe) chain operators: exact equality against their
one-phase siblings ON THE HOT-KEY CORPUS (r10 VERDICT #1 Done criterion).

AQE cannot split a `Window.partitionBy(user_id)` partition, so a 52%-hot
user serializes the one-phase chains into a single task at any cluster
size; the two-phase forms bound phase 1 by (user_id, day-chunk) and run
the boundary stitch over the chunk-grain relation. These pins prove the
decomposition is semantics-preserving exactly where it matters — on the
corpus with the hot user — row-for-row against the sibling, plus the
driver-identical oracle gate on the same corpus.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest

from kinesis_test_spark import registry
from kinesis_test_spark.oracle import check_query
from test_edge_hotkey import plant_hotkey

SF_SRC = "/root/testdata/sf0.001"

PAIRS = [
    # (two-phase key, sibling key, projection of the sibling to compare)
    ("q_sessionize_twophase", "q_sessionize", None),
    ("q_event_transitions_twophase", "q_event_transitions", None),
    # q_window_frame carries an extra bounded-frame column; compare the
    # shared prefix-sum columns
    (
        "q_window_cumsum_twophase",
        "q_window_frame",
        ["event_id", "user_id", "ts", "running_value"],
    ),
]


@pytest.fixture(scope="module")
def hotkey_dir(tmp_path_factory):
    d = Path(str(tmp_path_factory.mktemp("twophase_hotkey")))
    shutil.rmtree(d, ignore_errors=True)
    plant_hotkey(SF_SRC, d)
    return str(d)


def _rows(df, cols=None):
    if cols:
        df = df.select(*cols)
    cols = df.columns
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("two_phase,sibling,cols", PAIRS)
def test_twophase_equals_sibling_on_hotkey_corpus(
    spark, hotkey_dir, two_phase, sibling, cols
):
    registry.load_all()
    got = _rows(registry.QUERIES[two_phase](spark, hotkey_dir), cols)
    want = _rows(registry.QUERIES[sibling](spark, hotkey_dir), cols)
    assert got == want, f"{two_phase} != {sibling} on the hot-key corpus"


@pytest.mark.parametrize("name", [p[0] for p in PAIRS])
def test_twophase_oracle_parity_on_hotkey_corpus(spark, hotkey_dir, name):
    problems = check_query(spark, hotkey_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", [p[0] for p in PAIRS])
def test_twophase_phase1_partitions_by_chunk(spark, name):
    """The scale claim itself: phase 1's window must partition by the
    (user_id, chunk) pair — if a refactor drops the chunk key, the
    operator silently degrades to the one-phase single-task form and
    every equality pin above still passes."""
    from kinesis_test_spark import plans

    registry.load_all()
    plan = plans.formatted(registry.QUERIES[name](spark, SF_SRC))
    assert "chunk" in plan, f"{name}: no chunked window partition in plan"


def test_chunk_boundary_session_merges(spark, tmp_path):
    """A session STRADDLING midnight (events 23:50 and 00:05 next day,
    gap 15min < 30min) must come back as ONE session — the exact case
    phase 2 exists for. Built from a fresh 4-event table, checked through
    both forms."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    registry.load_all()
    d = tmp_path / "straddle"
    d.mkdir()
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)
    # micros-NTZ encoding matching current fixtures
    base = 1700_000_000_000_000  # some UTC instant
    day = 86_400_000_000
    midnight = (base // day + 1) * day
    rows = {
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 7],
        # 23:50, 23:58, 00:05(+1d), 02:00(+1d): first three one session
        # (gaps 8min, 7min across the boundary), the last a new session
        "ts": [
            midnight - 10 * 60_000_000,
            midnight - 2 * 60_000_000,
            midnight + 5 * 60_000_000,
            midnight + 120 * 60_000_000,
        ],
        "event_type": ["view"] * 4,
        "value": [1.0] * 4,
        "props": ["{}"] * 4,
    }
    ev = pq.read_table(d / "events.parquet")
    tbl = pa.table(
        {c: pa.array(rows[c]).cast(ev.schema.field(c).type) for c in ev.column_names}
    )
    pq.write_table(tbl, d / "events.parquet")
    for key in ("q_sessionize", "q_sessionize_twophase"):
        got = sorted(
            (r["user_id"], r["session_seq"], r["n_events"])
            for r in registry.QUERIES[key](spark, str(d)).collect()
        )
        assert got == [(7, 1, 3), (7, 2, 1)], (key, got)
