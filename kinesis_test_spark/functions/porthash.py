"""Portable (cross-engine) hashing primitives for sketch operators.

MinHash/SimHash/fingerprint operators need a hash both Spark and the DuckDB
oracle compute identically. Engine-native hashes (xxhash64 vs murmur) don't
match, so the sketches are built on md5 hex — available and identical in
both engines — with two portable projections:

  * hex-string minima: a minhash can take ``min()`` over md5 hex STRINGS —
    lexicographic order on a uniform hex hash is as good as numeric order.
  * ``hex16``: the first 4 hex chars as an integer in [0, 65535] for bit
    sketches (SimHash) and rolling fingerprints.

md5 here is a content fingerprint, not security. At 100 TB, one md5 per
shingle is the cost profile of any MinHash implementation; Spark evaluates
it JVM-side inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def spark_hex16(col: Column) -> Column:
    """First 16 bits of md5(col) as a long (JVM-side, codegen-friendly)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")


def sql_hex16(expr: str) -> str:
    """Same value in DuckDB SQL (no hex→int builtin that matches conv)."""
    digit = lambda i: f"(strpos('{HEX}', substr(md5({expr}), {i}, 1)) - 1)"  # noqa: E731
    return f"({digit(1)} * 4096 + {digit(2)} * 256 + {digit(3)} * 16 + {digit(4)})"


# --- portable ASCII-only case folding -------------------------------------
#
# Full Unicode case mapping is ENGINE-SPECIFIC: Spark uses the JDK's full
# mappings (upper('ß')='SS', lower('İ')='i'+COMBINING DOT, context-sensitive
# Greek final sigma) while DuckDB's utf8proc applies simple 1:1 mappings
# (upper('ß')='ẞ', lower('İ')='i', upper('ﬁ')='ﬁ').  Any key that RECOMPUTES
# a case fold on both engines therefore diverges on schema-legal text
# (tests/test_edge_unicode.py).  Keys that need a cross-engine-deterministic
# fold use these ASCII-only translate-based helpers on BOTH sides; non-ASCII
# letters pass through unchanged, which is also locale- and
# Unicode-version-stable — the right property for dedup/normalization at
# scale (a corpus normalizer must not change behavior when the JDK updates
# its Unicode tables).

ASCII_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LO = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column | str) -> Column:
    """ASCII-only lowercase (Spark side; mirror: ``sql_ascii_lower``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_UP, ASCII_LO)


def ascii_upper(col: Column | str) -> Column:
    """ASCII-only uppercase (Spark side; mirror: ``sql_ascii_upper``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_LO, ASCII_UP)


def sql_ascii_lower(expr: str) -> str:
    """DuckDB mirror of ``ascii_lower`` (translate is codepoint-exact in
    both engines; only the 26 ASCII letters are mapped)."""
    return f"translate({expr}, '{ASCII_UP}', '{ASCII_LO}')"


def sql_ascii_upper(expr: str) -> str:
    """DuckDB mirror of ``ascii_upper``."""
    return f"translate({expr}, '{ASCII_LO}', '{ASCII_UP}')"
