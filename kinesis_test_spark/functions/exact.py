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

_INF = float("inf")


def finite(col: Column | str) -> Column:
    """NULL out non-finite doubles (NaN/±Inf) — the quarantine contract.

    The engines disagree violently on non-finite input to the decimal
    route: Spark CAST(NaN/Inf AS DECIMAL) yields NULL (the sum silently
    drops the row) while DuckDB raises InvalidInput even through TRY_CAST.
    The contract is EXPLICIT symmetric exclusion, stated on both sides
    (mirror: ``sql_finite``). NULL input stays NULL (isnan(NULL) is NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(_INF)), c)


def sql_finite(expr: str) -> str:
    """SQL mirror of ``finite`` — ENGINE-PORTABLE on purpose: sql_dsum
    strings also run as Spark SQL (the SQL-string-API keys, e.g. TPC-H Q6
    feeds one text to both engines), so no DuckDB-only isfinite() here;
    isnan()/abs()/CAST('Infinity' AS DOUBLE) behave identically in both."""
    return (
        f"(CASE WHEN NOT isnan({expr})"
        f" AND abs({expr}) <> CAST('Infinity' AS DOUBLE) THEN {expr} END)"
    )


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
