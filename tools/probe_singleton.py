"""Full-surface sweep of the SINGLETON corpus (EDGES.md class 22):
every table restaged to exactly ONE row — the n=1 regime between the
empty corpus (n=0) and the constant corpus (n>>1 identical). Sample
statistics divide by n-1, one-row window partitions, empty pair/join
relations off a one-row base, broken referential integrity.

Corpus construction lives in tests/test_edge_singleton.py next to the
standing pins; this tool only drives the sweep (tools/_probe.py loop).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from _probe import sweep  # noqa: E402
from test_edge_singleton import plant_singleton  # noqa: E402

if __name__ == "__main__":
    sweep(plant_singleton, "singleton")
