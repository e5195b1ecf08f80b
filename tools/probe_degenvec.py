"""Plant DEGENERATE-VALUED embedding vectors — exact zero, float32
min-subnormal, negative zero, sign-flip (genuine -1.0 cosine colliding
with the sentinel), exact duplicate of the family query vector (1.0 tie
at the top of every ranking), a ×3 scaled copy, a large-but-IN-domain
1e5 vector (must flow through), and an ABOVE-domain 1e11 vector (must
quarantine symmetrically — over VEC_COMPONENT_MAX=1e6, the round-12
route-derived bound) — and gate the WHOLE surface.

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
