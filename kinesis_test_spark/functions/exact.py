"""Exact (order-independent) floating-point aggregation helpers.

Double summation is not associative; Spark's partial/final aggregation and
DuckDB's accumulate in different orders, so a raw ``SUM(double)`` can differ
in the last bits between engines — and between RUNS on a cluster, as task
scheduling changes. Routing through decimal makes the aggregate exact and
order-independent, which is also what you want at 100 TB: results must not
depend on partition count.

Pattern (mirrored verbatim in the DuckDB oracle SQL):
    Spark :  F.sum(col.cast("decimal(p,s)")).cast("double")
    oracle:  CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The exact-aggregation domain: |x| < 1e12. One bound quarantines every
# value the decimal routes can misrepresent — NaN and ±Inf (abs(x) < b is
# FALSE for NaN in BOTH engines: NaN compares greater than everything) AND
# finite out-of-range magnitudes, where the engines split exactly like
# they do on NaN (Spark CAST(1e20 AS DECIMAL(18,2)) silently NULLs, DuckDB
# raises even through TRY_CAST). 1e12 is the tightest 10^(prec-scale)
# across the routes in use, applied uniformly so the cast precision stays
# an implementation detail rather than a per-operator semantic boundary.
EXACT_MAX = 1e12


def finite(col: Column | str) -> Column:
    """NULL out doubles outside the exact-aggregation domain (NaN, ±Inf,
    |x| >= EXACT_MAX) — the quarantine contract, stated identically on
    both engines (mirror: ``sql_finite``). NULL input stays NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.abs(c) < F.lit(EXACT_MAX), c)


def sql_finite(expr: str) -> str:
    """SQL mirror of ``finite`` — ENGINE-PORTABLE on purpose: sql_dsum
    strings also run as Spark SQL (the SQL-string-API keys, e.g. TPC-H Q6
    feeds one text to both engines). abs(x) < 1e12 evaluates identically
    in both (NaN/Inf compare greater than any bound; NULL stays NULL)."""
    return f"(CASE WHEN abs({expr}) < 1.0e12 THEN {expr} END)"


def dsum(col: Column | str, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM over a double column, returned as double.

    Non-finite inputs are excluded explicitly (see ``finite``)."""
    c = finite(col)
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as double.

    The count is over the SAME finite-guarded value as the sum — counting
    raw non-NULLs would divide a non-finite-excluded sum by a larger n."""
    c = finite(col)
    return (
        F.sum(c.cast(f"decimal({prec},{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    g = sql_finite(expr)
    return f"CAST(SUM(CAST({g} AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    g = sql_finite(expr)
    return (
        f"CAST(SUM(CAST({g} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({g}) AS {alias}"
    )
