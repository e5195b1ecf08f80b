"""Plant wrong-shaped embedding vectors (3-component, EMPTY list,
DIM+5) and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_ragged.plant_ragged
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that dot, slice, index, or aggregate an embedding column.

NOTE: the un-quarantined empty list FATALLY invalidates a DuckDB
connection (list_cosine_similarity internal error), so check_query's
fresh-connection-per-key layout is itself part of what makes this probe
runnable."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_ragged import plant_ragged  # noqa: E402

if __name__ == "__main__":
    sweep(plant_ragged, "ragged")
