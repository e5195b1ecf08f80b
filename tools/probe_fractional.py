"""Full-surface sweep of the FRACTIONAL / SUB-GRAIN corpus (EDGES.md
class 23): monetary doubles within an ULP of the .{s}5 boundary (the
engine-ambiguous double→DECIMAL quantization class, both directions),
an exact cents tie, and fractional quantities.

Corpus construction lives in tests/test_edge_fractional.py next to the
standing pins; this tool only drives the sweep (tools/_probe.py loop).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from _probe import sweep  # noqa: E402
from test_edge_fractional import plant_fractional  # noqa: E402

if __name__ == "__main__":
    sweep(plant_fractional, "fractional")
