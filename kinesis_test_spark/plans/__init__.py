"""Physical-plan introspection — the 100 TB design checks.

Correctness says a query returns the right rows; these helpers say whether
it would still be the plan you want at 1000× the data: filters reaching the
parquet scan, dims broadcast instead of shuffled, top-k via heap instead of
global sort, aggregates partial+final. tests/test_plans.py pins these
properties so a refactor can't silently regress the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has(df: DataFrame, *needles: str) -> list[str]:
    """Return the needles missing from the formatted physical plan."""
    plan = formatted(df)
    return [n for n in needles if n not in plan]


def pushed_filters(df: DataFrame) -> str:
    plan = formatted(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema(df: DataFrame) -> str:
    plan = formatted(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)
