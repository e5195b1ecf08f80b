"""Plant OVERSIZED payloads (20k-word doc, one 100k-char token, 10k-fold
word repeat, 50 KB JSON string in events.props) and gate the WHOLE
surface — edge class 19.

Size is the dirt: the class catches size-dependent engine divergence
(regex limits, pair-math int widths, length cutoffs) and non-totality
(errors/hangs on merely-large rows — ordinary at 100 TB). Standing pins
over the size-sensitive families live in tests/test_edge_giant.py."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_giant import plant_giant  # noqa: E402

if __name__ == "__main__":
    sweep(plant_giant, "giant")
