"""Plant schema-legal EXTREME-MAGNITUDE doubles (±1e20 in events.value /
lineitem.l_extendedprice / orders.o_totalprice, 1e30 embedding component)
and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_magnitude.plant_magnitude
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that route a double through a DECIMAL(p,s) cast."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_magnitude import plant_magnitude  # noqa: E402

if __name__ == "__main__":
    sweep(plant_magnitude, "magnitude")
