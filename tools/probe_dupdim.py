"""Adversarial probe — EDGE CLASS 20: dirty dimensions (duplicate / NULL
primary keys in customer/part/supplier/nation/orders). See
tests/test_edge_dupdim.py for the corpus and the standing pins."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from _probe import sweep  # noqa: E402
from test_edge_dupdim import plant_dupdim  # noqa: E402

if __name__ == "__main__":
    sweep(plant_dupdim, "dupdim")
