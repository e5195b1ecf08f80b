"""Unit tests for bench.py's in-round regression gate (no Spark needed)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)


def test_flags_only_above_ratio():
    prev = {"q_a": 1.0, "q_b": 2.0, "q_c": 4.0}
    cur = {"q_a": 1.49, "q_b": 3.1, "q_c": 4.0, "q_new": 9.0}
    flagged = bench.flag_regressions(cur, prev, ratio=1.5)
    assert set(flagged) == {"q_b"}
    assert flagged["q_b"] == {"prev": 2.0, "cur": 3.1, "ratio": 1.55}


def test_absolute_floor_suppresses_subsecond_noise():
    # Sub-second entries move ±40% run-to-run on this host (BASELINE.md):
    # a 3× ratio on a 0.2s query is noise; the same ratio with a >0.5s
    # absolute move is a real regression.
    prev = {"q_noise": 0.2, "q_real": 0.4}
    cur = {"q_noise": 0.6, "q_real": 1.2}
    flagged = bench.flag_regressions(cur, prev, ratio=1.5, min_delta=0.5)
    assert set(flagged) == {"q_real"}


def test_no_previous_bench_flags_nothing():
    assert bench.flag_regressions({"q_a": 99.0}, {}) == {}


def test_previous_bench_picks_latest_parseable(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 1.0}}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 2.0}}})
    )
    (tmp_path / "BENCH_r03.json").write_text("{not json")
    name, prev, prev_burn = bench.previous_bench(str(tmp_path))
    assert name == "BENCH_r02.json"
    assert prev == {"q_a": 2.0}
    assert prev_burn is None  # no host block recorded


def test_previous_bench_none_when_absent(tmp_path):
    assert bench.previous_bench(str(tmp_path)) == (None, {}, None)


def test_previous_bench_requires_matching_sf(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 1.0}, "sf": 0.1}})
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"queries": {"q_a": 2.0}, "sf": 0.001}})
    )
    name, prev, _ = bench.previous_bench(str(tmp_path), sf=0.1)
    assert name == "BENCH_r01.json"
    assert prev == {"q_a": 1.0}
    assert bench.previous_bench(str(tmp_path), sf=0.5) == (None, {}, None)


def test_previous_bench_reads_burn_probe_floor(tmp_path):
    # the burn-probe floor (min of before/after) is the baseline run's
    # least-contended moment — the denominator of the host factor
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps(
            {
                "parsed": {
                    "queries": {"q_a": 1.0},
                    "host": {
                        "burn_probe_sec_before": 0.52,
                        "burn_probe_sec_after": 0.34,
                    },
                }
            }
        )
    )
    name, prev, prev_burn = bench.previous_bench(str(tmp_path))
    assert name == "BENCH_r01.json"
    assert prev_burn == 0.34


def test_host_factor_scales_gate():
    # a 2x-contended host (burn probe 2x the baseline's) must not mint a
    # phantom flag on a uniformly-inflated entry; a genuine regression
    # beyond the scaled threshold still flags
    prev = {"q_uniform": 1.0, "q_real": 1.0}
    cur = {"q_uniform": 2.0, "q_real": 4.0}  # uniform 2x inflation; real 4x
    effective = 1.5 * 2.0  # REGRESSION_RATIO x host_factor
    flagged = bench.flag_regressions(cur, prev, ratio=effective)
    assert set(flagged) == {"q_real"}
