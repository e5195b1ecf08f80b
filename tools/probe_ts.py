"""Plant extreme timestamps (deep pre-epoch, pre-epoch-by-1us, exact
epoch, far-future 2200 in events.ts; 1950 l_shipdate; 2199 o_orderdate)
and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_ts_extremes.
plant_ts_extremes (the standing in-suite pin over the keys that ever
diverged); this tool sweeps ALL registered keys against the same corpus —
run it when adding operators that bucket, diff, or epoch-convert a
timestamp column."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_ts_extremes import plant_ts_extremes  # noqa: E402

if __name__ == "__main__":
    sweep(plant_ts_extremes, "ts")
