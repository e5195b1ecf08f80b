"""Plant DEGENERATE-VALUED (but fully valid) embedding vectors — exact
zero, float32 min-subnormal, negative zero, sign-flip (genuine -1.0
cosine colliding with the sentinel), exact duplicate of the family query
vector (1.0 tie at the top of every ranking), a ×3 scaled copy, and a
huge-but-in-domain 1e11 vector — and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_degenvec.plant_degenvec
(the standing in-suite pin over the embedding-consumer families); this
tool sweeps ALL registered keys. Run it when adding operators that rank,
threshold, normalize, or assign embeddings: the sharp edges are the
zero-norm sentinel being a GENUINE cosine value too, and exact ties at
the extremes of DESC rankings."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_degenvec import plant_degenvec  # noqa: E402

if __name__ == "__main__":
    sweep(plant_degenvec, "degenvec")
