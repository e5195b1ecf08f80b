"""Plant ZERO-VARIANCE / ALL-TIES shapes (constant per-user values,
identical + scalar-multiple embeddings, identical template text under
distinct doc ids) and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_constant.plant_constant
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that divide by a data-derived spread (stddev/variance/range),
correlate columns, or rank by a similarity score that can tie exactly."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_constant import plant_constant  # noqa: E402

if __name__ == "__main__":
    sweep(plant_constant, "constant")
