"""Restage every table with ZERO rows (schema preserved) and gate the
WHOLE surface — the empty-partition/empty-day totality sweep.

The corpus construction lives in tests/test_edge_empty.plant_empty; this
tool sweeps ALL registered keys against it — run it when adding operators
that collect driver-side scalars (vocab, centroids, totals) or stage
fixtures derived from table contents."""
import os, sys, shutil
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from test_edge_empty import plant_empty  # noqa: E402

from kinesis_test_spark.oracle import check_query  # noqa: E402
from kinesis_test_spark.session import get_spark  # noqa: E402
from kinesis_test_spark import registry  # noqa: E402

registry.load_all()

SRC = "/root/testdata/sf0.001"
# pid-scoped: a concurrent probe's rmtree must not delete the corpus out
# from under this run's in-flight scans (round-6 scratch_dir lesson)
d = Path(f"/tmp/empty_sf_{os.getpid()}")
shutil.rmtree(d, ignore_errors=True)
plant_empty(SRC, d)

spark = get_spark()
fails = {}
keys = sorted(registry.QUERIES)
for i, name in enumerate(keys):
    try:
        problems = check_query(spark, str(d), name)
        status = "OK" if not problems else "; ".join(problems)[:220]
    except Exception as exn:
        status = f"ERROR {type(exn).__name__}: {str(exn)[:220]}"
    if status != "OK":
        fails[name] = status
        print(f"FAIL {name}: {status}", flush=True)
    if (i + 1) % 50 == 0:
        print(f"... {i+1}/{len(keys)}", flush=True)
print("EMPTYPROBE-DONE", len(keys), "keys,", len(fails), "failures")
