"""Per-key adversarial battery: run the NAMED keys through EVERY planted
corpus class (every tests/test_edge_* plant function) in one process.

Usage: python tools/battery.py q_dedup_semantic [q_other ...]

This is the round-discipline tool for "every changed/new key carries its
own corpus battery from final code" (CLAUDE.md round-10 closing note):
full-surface probe sweeps cost ~15 × 269 key-checks, while a changed-key
battery costs 15 × |changed| — same evidence for the keys that moved.
Corpus construction stays in tests/test_edge_*.py next to each class's
standing pins; this tool only drives them.
"""
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo/tools")

from _probe import SRC, TRUNC  # noqa: E402


def plant_classes():
    """[(tag, plant_fn)] for every adversarial corpus class."""
    from test_edge_constant import plant_constant
    from test_edge_degenvec import plant_degenvec
    from test_edge_dupdim import plant_dupdim
    from test_edge_dupkeys import plant_dupkeys
    from test_edge_empty import plant_empty
    from test_edge_fractional import plant_fractional
    from test_edge_giant import plant_giant
    from test_edge_hotkey import plant_hotkey
    from test_edge_late import plant_late
    from test_edge_magnitude import plant_magnitude
    from test_edge_negatives import plant_negatives
    from test_edge_negzero import plant_negzero
    from test_edge_nonfinite import plant_nonfinite
    from test_edge_nulls import plant_nulls
    from test_edge_nullts import plant_nullts
    from test_edge_ragged import plant_ragged
    from test_edge_singleton import plant_singleton
    from test_edge_subgrain import plant_subgrain
    from test_edge_ts_extremes import plant_ts_extremes
    from test_edge_unicode import plant_unicode
    from test_edge_whitespace import plant_whitespace

    return [
        ("constant", plant_constant),
        ("degenvec", plant_degenvec),
        ("dupdim", plant_dupdim),
        ("dupkeys", plant_dupkeys),
        ("empty", plant_empty),
        ("fractional", plant_fractional),
        ("giant", plant_giant),
        ("hotkey", plant_hotkey),
        ("late", plant_late),
        ("magnitude", plant_magnitude),
        ("negatives", plant_negatives),
        ("negzero", plant_negzero),
        ("nonfinite", plant_nonfinite),
        ("nulls", plant_nulls),
        ("nullts", plant_nullts),
        ("ragged", plant_ragged),
        ("singleton", plant_singleton),
        ("subgrain", plant_subgrain),
        ("ts_extremes", plant_ts_extremes),
        ("unicode", plant_unicode),
        ("whitespace", plant_whitespace),
    ]


def battery(keys: list[str]) -> dict[tuple[str, str], str]:
    from kinesis_test_spark import registry
    from kinesis_test_spark.oracle import check_query
    from kinesis_test_spark.session import get_spark

    registry.load_all()
    unknown = [k for k in keys if k not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    spark = get_spark()
    fails: dict[tuple[str, str], str] = {}
    for tag, plant in plant_classes():
        d = Path(f"/tmp/battery_{tag}_{os.getpid()}")
        shutil.rmtree(d, ignore_errors=True)
        plant(SRC, d)
        for name in keys:
            try:
                problems = check_query(spark, str(d), name)
                status = "OK" if not problems else "; ".join(problems)[:TRUNC]
            except Exception as exn:
                status = f"ERROR {type(exn).__name__}: {str(exn)[:TRUNC]}"
            if status != "OK":
                fails[(tag, name)] = status
                print(f"FAIL [{tag}] {name}: {status}", flush=True)
        print(f"... {tag} done", flush=True)
        # NOT deleted here: an async Spark job (e.g. a cancelled scan) can
        # still hold the dir — deleting mid-session races it (observed as a
        # harmless but noisy FileNotFound job abort). Dirs are pid-scoped
        # under /tmp; the next run of the same pid rmtree's before planting.
    n = len(plant_classes()) * len(keys)
    print(f"BATTERY-DONE {len(keys)} keys x {len(plant_classes())} classes"
          f" = {n} checks, {len(fails)} failures")
    return fails


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    sys.exit(1 if battery(sys.argv[1:]) else 0)
