"""Plant id↔time ANTI-CORRELATED events (late / out-of-order delivery —
the at-least-once-with-delay shape, reference analog MillisBehindLatest,
record.json:42) and gate the WHOLE surface.

The corpus construction lives in tests/test_edge_late.plant_late (the
standing in-suite pins cover the multi-batch rigs and the
watermark-consuming arrival experiments); this tool sweeps ALL
registered keys — run it when adding operators that stage multi-batch
arrivals or consume watermarks."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_late import plant_late  # noqa: E402

if __name__ == "__main__":
    sweep(plant_late, "late")
