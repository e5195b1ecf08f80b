"""Plant WHITESPACE-PATHOLOGY documents (double/leading/trailing space
runs, tab/newline/CRLF separators, whitespace-only texts — every one
produces EMPTY TOKENS under the literal-space split the whole text
family tokenizes with) and gate the WHOLE surface.

The corpus construction lives in
tests/test_edge_whitespace.plant_whitespace (the standing in-suite pin
over the keys that ever diverged); this tool sweeps ALL registered keys
against the same corpus — run it when adding operators that split,
count, shingle, or score text."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_whitespace import plant_whitespace  # noqa: E402

if __name__ == "__main__":
    sweep(plant_whitespace, "whitespace")
