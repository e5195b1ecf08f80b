"""Plant the VOLUMETRIC HOT-KEY corpus (one user holds ~50 % of events,
one source holds ~50 % of docs — dirty DISTRIBUTION, not dirty values;
EDGES.md class 18) and sweep the whole registered surface.

The corpus construction lives in tests/test_edge_hotkey.plant_hotkey
(the standing in-suite pin over the skew-sensitive consumer families);
this tool sweeps ALL registered keys against the same corpus — run it
when adding operators that group, window, session, or dedup over a
user/source key."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_hotkey import plant_hotkey  # noqa: E402

if __name__ == "__main__":
    sweep(plant_hotkey, "hotkey")
