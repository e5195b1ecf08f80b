"""Plant byte-identical duplicate-key rows (events event_id, documents
doc_id, embeddings vec_id — the at-least-once redelivery shape) and gate
the WHOLE surface.

The corpus construction lives in tests/test_edge_dupkeys.plant_dupkeys
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that dedup, pick-one-per-id, or otherwise assume id
uniqueness."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_dupkeys import plant_dupkeys  # noqa: E402

if __name__ == "__main__":
    sweep(plant_dupkeys, "dupkeys")
