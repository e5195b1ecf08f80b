"""Plant schema-legal NULL rows (events value/event_type/user_id/props,
documents.text, embeddings.embedding) and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_nulls.plant_nulls (the
standing in-suite pin over the keys that ever diverged); this tool sweeps
ALL registered keys against the same corpus — run it when adding operators
that touch a new NULL-able column shape."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_nulls import plant_nulls  # noqa: E402

if __name__ == "__main__":
    sweep(plant_nulls, "nulls")
