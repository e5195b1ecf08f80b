"""Plant events rows with NULL ts (schema-legal — the one events column
no other corpus nulls, and THE ordering/bucketing column everywhere) and
gate the WHOLE surface.

The corpus construction lives in tests/test_edge_nullts.plant_nullts
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that order, window, bucket, or session over a timestamp."""
import os, sys, shutil
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from test_edge_nullts import plant_nullts  # noqa: E402

from kinesis_test_spark.oracle import check_query  # noqa: E402
from kinesis_test_spark.session import get_spark  # noqa: E402
from kinesis_test_spark import registry  # noqa: E402

registry.load_all()

SRC = "/root/testdata/sf0.001"
# pid-scoped: a concurrent probe must not rmtree this run's corpus
d = Path(f"/tmp/nullts_sf_{os.getpid()}")
shutil.rmtree(d, ignore_errors=True)
plant_nullts(SRC, d)

spark = get_spark()
fails = {}
keys = sorted(registry.QUERIES)
for i, name in enumerate(keys):
    try:
        problems = check_query(spark, str(d), name)
        status = "OK" if not problems else "; ".join(problems)[:200]
    except Exception as exn:
        status = f"ERROR {type(exn).__name__}: {str(exn)[:200]}"
    if status != "OK":
        fails[name] = status
        print(f"FAIL {name}: {status}", flush=True)
    if (i + 1) % 50 == 0:
        print(f"... {i+1}/{len(keys)}", flush=True)
print("NULLTSPROBE-DONE", len(keys), "keys,", len(fails), "failures")
