"""Exact (order-independent) floating-point aggregation helpers.

Double summation is not associative; Spark's partial/final aggregation and
DuckDB's accumulate in different orders, so a raw ``SUM(double)`` can differ
in the last bits between engines — and between RUNS on a cluster, as task
scheduling changes. Routing through decimal makes the aggregate exact and
order-independent, which is also what you want at 100 TB: results must not
depend on partition count.

Pattern (mirrored verbatim in the DuckDB oracle SQL; r13 cents form):
    Spark :  F.sum(F.round(col * 10^s).cast("decimal(p,0)")).cast("double") / 10^s
    oracle:  CAST(SUM(CAST(ROUND(x * 10^s.0) AS DECIMAL(p,0))) AS DOUBLE) / 10^s.0

WHY the quantization is an explicit ROUND(x · 10^s) rather than the direct
CAST(x AS DECIMAL(p,s)) the route used through round 12: the direct cast's
double→decimal conversion is ALGORITHMICALLY DIFFERENT between the engines
— Spark goes through Java's BigDecimal.valueOf (HALF_UP on the double's
SHORTEST decimal repr) while DuckDB scales the BINARY value — and the two
disagree on schema-legal inputs within an ULP of the  .{s}5  boundary
(probed r13: CAST(1048576.005 AS DECIMAL(18,2)) → 1048576.01 Spark /
1048576.00 DuckDB, and 7.5649999999999995 splits the OTHER way; a scan of
n.xx5-shaped doubles found the class dense near power-of-two magnitudes).
The cents form is unambiguous by construction: x·10^s is ONE IEEE multiply
(bit-identical cross-engine), ROUND to integer of a double has no
repr-vs-binary gap (a shortest repr of exactly k.5 round-trips only when
the double IS exactly k.5) and both engines round that tie away from zero
(probed incl. negatives), the integer-valued double converts to
DECIMAL(p,0) exactly, and the final /10^s is one more shared IEEE op. On
inputs that are exact s-decimals (every clean fixture) the two forms are
bit-identical; they differ only on sub-grain inputs, where the old form
was engine-ambiguous. Inline CAST(… AS DECIMAL(18,2)) oracle copies carry
the same rule site-by-site.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The exact-aggregation domain: |x| < 1e12. One bound quarantines every
# value the decimal routes can misrepresent — NaN and ±Inf (abs(x) < b is
# FALSE for NaN in BOTH engines: NaN compares greater than everything) AND
# finite out-of-range magnitudes, where the engines split exactly like
# they do on NaN (Spark CAST(1e20 AS DECIMAL(18,2)) silently NULLs, DuckDB
# raises even through TRY_CAST). Guards adjacent to a DECIMAL(p,s) cast
# bound at min(10^(p-s), 10^DOUBLE_SAFE_EXP) — what the route can
# represent AND hand back through DOUBLE deterministically — so wide
# routes don't quarantine legitimate values (a time-weighted product
# legitimately nears 1e12); statistics, rendering, and non-decimal
# guards use this default domain.
EXACT_MAX = 1e12


# Decimal-adjacent guards cap at 1e15 regardless of the route's width:
# the aggregate VALUE is exact at any 10^(p-s), but the OUTPUT leaves as
# DOUBLE, and DuckDB's DECIMAL->DOUBLE conversion (int128 divided by 10^s
# in float arithmetic) drifts a ULP from Java's correctly-rounded
# BigDecimal.doubleValue once magnitudes push the scaled value past 2^53
# (observed: TPC-H Q1 accepting a planted 1e20 diverged in the 17th digit).
DOUBLE_SAFE_EXP = 15


def finite(col: Column | str, exp: int = 12) -> Column:
    """NULL out doubles outside the quarantine bound 10**exp (defaults to
    EXACT_MAX's 1e12) — NaN/±Inf always excluded (they compare greater
    than any bound in both engines), NULL stays NULL. Guards adjacent to
    a DECIMAL(p,s) cast pass exp = p - s (capped at DOUBLE_SAFE_EXP) so
    the bound is what the route can represent AND still hand back through
    DOUBLE deterministically (mirror: ``sql_finite``);
    statistics/rendering guards keep the default domain."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.abs(c) < F.lit(10.0 ** min(exp, DOUBLE_SAFE_EXP)), c)


def sql_finite(expr: str, exp: int = 12) -> str:
    """SQL mirror of ``finite`` — ENGINE-PORTABLE on purpose: sql_dsum
    strings also run as Spark SQL (the SQL-string-API keys, e.g. TPC-H Q6
    feeds one text to both engines). abs(x) < 1.0eN evaluates identically
    in both (NaN/Inf compare greater than any bound; NULL stays NULL)."""
    return f"(CASE WHEN abs({expr}) < 1.0e{min(exp, DOUBLE_SAFE_EXP)} THEN {expr} END)"


def _cents(c: Column, scale: int) -> Column:
    """Deterministic quantization to the scale grain (module docstring):
    ONE shared IEEE multiply + an integer ROUND with agreeing tie rule —
    never the engine-ambiguous direct double→DECIMAL(p,s) cast."""
    return F.round(c * F.lit(float(10**scale)))


def dsum(col: Column | str, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM over a double column, returned as double.

    Inputs the route cannot represent are excluded explicitly (see
    ``finite``; bound 10^(prec-scale)). Quantization via the cents form
    (module docstring) — the direct DECIMAL(p,s) cast is engine-ambiguous
    within an ULP of the .{s}5 boundary."""
    c = finite(col, prec - scale)
    return (
        F.sum(_cents(c, scale).cast(f"decimal({prec},0)")).cast("double")
        / F.lit(float(10**scale))
    ).alias(alias)


def davg(col: Column | str, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact cents sum / 10^s / count, as double.

    The count is over the SAME finite-guarded value as the sum — counting
    raw non-NULLs would divide a non-finite-excluded sum by a larger n."""
    c = finite(col, prec - scale)
    return (
        F.sum(_cents(c, scale).cast(f"decimal({prec},0)")).cast("double")
        / F.lit(float(10**scale))
        / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    g = sql_finite(expr, prec - scale)
    m = f"1.0e{scale}"
    return (
        f"CAST(SUM(CAST(ROUND(({g}) * {m}) AS DECIMAL({prec},0))) AS DOUBLE)"
        f" / {m} AS {alias}"
    )


def sql_davg(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    g = sql_finite(expr, prec - scale)
    m = f"1.0e{scale}"
    return (
        f"CAST(SUM(CAST(ROUND(({g}) * {m}) AS DECIMAL({prec},0))) AS DOUBLE)"
        f" / {m} / COUNT({g}) AS {alias}"
    )
