"""Restage every table with ZERO rows (schema preserved) and gate the
WHOLE surface — the empty-partition/empty-day totality sweep.

The corpus construction lives in tests/test_edge_empty.plant_empty; this
tool sweeps ALL registered keys against it — run it when adding operators
that collect driver-side scalars (vocab, centroids, totals) or stage
fixtures derived from table contents."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_empty import plant_empty  # noqa: E402

if __name__ == "__main__":
    sweep(plant_empty, "empty")
