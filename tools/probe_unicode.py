"""Plant dirty-Unicode text (case-mapping pathologies, ligatures,
combining marks, astral emoji/ZWJ, CJK, RTL, exotic whitespace, embedded
NUL, unicode JSON) into documents/customer/events and gate the WHOLE
surface.

The corpus construction lives in tests/test_edge_unicode.plant_unicode
(the standing in-suite pin over the keys that ever diverged); this tool
sweeps ALL registered keys against the same corpus — run it when adding
operators that case-fold, tokenize, or regex over a string column."""
import sys

sys.path.insert(0, "/root/repo/tools")
from _probe import sweep  # noqa: E402  (also puts /root/repo + tests on path)
from test_edge_unicode import plant_unicode  # noqa: E402

if __name__ == "__main__":
    sweep(plant_unicode, "unicode")
