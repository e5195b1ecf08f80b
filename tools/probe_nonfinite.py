"""Plant schema-legal NON-FINITE doubles (NaN/+Inf/-Inf in events.value,
NaN/Inf components in embeddings.embedding) and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_nonfinite.plant_nonfinite
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that aggregate, cast, or rank a double column."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_nonfinite import plant_nonfinite  # noqa: E402

if __name__ == "__main__":
    sweep(plant_nonfinite, "nonfinite")
