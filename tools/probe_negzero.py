"""Plant IEEE NEGATIVE ZERO (-0.0) into events.value, lineitem monetary
doubles and embedding components, and gate the WHOLE surface.

-0.0 == +0.0 for comparison/grouping, but repr/value-hash distinguish
them, and an engine that COMPUTES a zero (interpolation, rank-picking
over the equal class) surfaces an arbitrary sign. The corpus lives in
tests/test_edge_negzero.plant_negzero; run this when adding operators
that return computed doubles."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_negzero import plant_negzero  # noqa: E402

if __name__ == "__main__":
    sweep(plant_negzero, "negzero")
