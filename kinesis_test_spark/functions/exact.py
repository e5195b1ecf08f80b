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


def dsum(col: Column | str, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({prec},{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
