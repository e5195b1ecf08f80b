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
