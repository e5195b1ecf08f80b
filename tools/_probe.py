"""Shared adversarial-corpus sweep runner for the tools/probe_*.py
family.

Every probe has the same shape: restage sf0.001 with one class of dirt
planted (the plant function lives next to that class's standing pins in
tests/test_edge_*.py), then run the FULL registered surface through
check_query against the planted corpus and print divergences. This
module is the single copy of that loop — a probe script is now just its
class docstring plus ``sweep(plant_fn, tag)``.

Properties every probe relies on (fix them HERE, once):
- pid-scoped corpus dir (a concurrent probe of the same class must not
  rmtree this run's staging);
- fresh-connection-per-key inside check_query (an un-quarantined dirty
  value can fatally invalidate a DuckDB connection — ragged class);
- per-key try/except so one crashing key doesn't hide the rest of the
  sweep.
"""
import os
import shutil
import sys
from pathlib import Path
from typing import Callable

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SRC = "/root/testdata/sf0.001"
TRUNC = 220  # chars of a problem/exception message to keep per key


def sweep(plant_fn: Callable[[str, Path], None], tag: str) -> dict[str, str]:
    """Plant ``plant_fn``'s corpus under a pid-scoped /tmp dir and sweep
    ALL registered keys; print FAILs as they happen and a
    ``<TAG>PROBE-DONE <n> keys, <m> failures`` banner at the end.
    Returns {key: status} for the divergent keys."""
    from kinesis_test_spark.oracle import check_query
    from kinesis_test_spark.session import get_spark
    from kinesis_test_spark import registry

    registry.load_all()
    d = Path(f"/tmp/{tag}_sf_{os.getpid()}")
    shutil.rmtree(d, ignore_errors=True)
    plant_fn(SRC, d)

    spark = get_spark()
    fails: dict[str, str] = {}
    keys = sorted(registry.QUERIES)
    for i, name in enumerate(keys):
        try:
            problems = check_query(spark, str(d), name)
            status = "OK" if not problems else "; ".join(problems)[:TRUNC]
        except Exception as exn:
            status = f"ERROR {type(exn).__name__}: {str(exn)[:TRUNC]}"
        if status != "OK":
            fails[name] = status
            print(f"FAIL {name}: {status}", flush=True)
        if (i + 1) % 50 == 0:
            print(f"... {i+1}/{len(keys)}", flush=True)
    print(f"{tag.upper()}PROBE-DONE", len(keys), "keys,", len(fails), "failures")
    return fails
