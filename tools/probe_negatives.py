"""Plant schema-legal NEGATIVE ids/values (events event_id/user_id/value,
documents.doc_id, embeddings.vec_id) and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_negatives.plant_negatives
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that slice, bucket, or drop rows by id sign."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_negatives import plant_negatives  # noqa: E402

if __name__ == "__main__":
    sweep(plant_negatives, "negatives")
