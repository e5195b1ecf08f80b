"""Plant events rows with NULL ts (schema-legal — the one events column
no other corpus nulls, and THE ordering/bucketing column everywhere) and
gate the WHOLE surface.

The corpus construction lives in tests/test_edge_nullts.plant_nullts
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that order, window, bucket, or session over a timestamp."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_nullts import plant_nullts  # noqa: E402

if __name__ == "__main__":
    sweep(plant_nullts, "nullts")
