"""Adversarial duplicate-timestamp fixture: same-(user_id, ts) event rows.

The round-6 ADVICE class: a window ordered by ts alone attaches tied rows
nondeterministically, so DuckDB and Spark can disagree — but the shipped
fixtures contain no same-user timestamp ties, so parity passes silently
until a regen (round 4 already changed the fixture once) or real data
plants one. Here we restage sf0.001 with 12 planted ties — duplicated
(user_id, ts) pairs under NEW event_ids with DIFFERENT event_type/value,
so a wrong tie attachment changes sessions, funnels, as-of matches, or
argmax rows — and re-run the driver-identical oracle gate over every
ts-ordering consumer (probed green before pinning)."""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis_test_spark.oracle import check_query

SF_SRC = "/root/testdata/sf0.001"

# Every key whose Spark plan or oracle orders/partitions on events.ts.
TS_TIE_KEYS = [
    "q_sessionize",
    "q_session_native",
    "q_session_dynamic",
    "q_window_lag",
    "q_window_rank",
    "q_window_frame",
    "q_window_dist",
    "q_window_ntile",
    "q_window_range_frame",
    "q_window_rolling_median",
    "q_event_transitions",
    "q_resample_ffill",
    "q_wow_change",
    "q_funnel",
    "q_funnel_timeboxed",
    "q_attribution",
    "q_agg_argmax",
    "q_scd2_intervals",
    "q_time_weighted_avg",
    "q_topk_per_group",
    "q_cumulative",
    "q_join_asof",
    "q_join_asof_forward",
    "q_join_asof_union",
    "q_join_nearest",
    "q_gap_fill",
    "q_cdc_changes",
    "q_retention",
    "q_cohort_ltv",
    "q_rfm",
    "q_agg_mode",
    # the stateful TTL sessionizer sorts (ts, event_id) inside the update
    # fn and its oracle windows carry the same tie-break
    "s_state_ttl",
]


@pytest.fixture(scope="module")
def dup_ts_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dup_ts_sf")
    for f in Path(SF_SRC).glob("*.parquet"):
        shutil.copy(f, d / f.name)
    ev = pq.read_table(d / "events.parquet")
    head = ev.slice(0, 12).to_pydict()
    extra = pa.table(
        {
            "event_id": [90000000 + i for i in range(12)],
            "ts": head["ts"],
            "user_id": head["user_id"],
            "event_type": ["purchase"] * 6 + ["click"] * 6,
            "value": [7.77 + i for i in range(12)],
            "props": ['{"k": -1}'] * 12,
        },
        schema=ev.schema,
    )
    pq.write_table(pa.concat_tables([ev, extra]), d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("name", TS_TIE_KEYS)
def test_duplicate_timestamp_parity(spark, dup_ts_sf_dir, name):
    problems = check_query(spark, dup_ts_sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)
