"""Full-surface sweep of the SUB-GRAIN-AT-HIGHER-SCALES corpus (EDGES.md
class 24): mined diverger inputs for the scale-6/8/12/16 decimal
quantization routes — entropy-term word counts, float32 centroid
components (incl. the exact 2^-17 tie), and .{6}5-boundary event values.

Corpus construction lives in tests/test_edge_subgrain.py next to the
standing pins; this tool only drives the sweep (tools/_probe.py loop).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from _probe import sweep  # noqa: E402
from test_edge_subgrain import plant_subgrain  # noqa: E402

if __name__ == "__main__":
    sweep(plant_subgrain, "subgrain")
