"""DuckDB oracle harness — mirrors the driver's correctness gate.

For a query key: run the Spark DataFrame and the oracle SQL on the same
parquet tables, canonicalize both result sets (columns sorted by name, rows
order-insensitive, values rendered engine-neutrally), and diff. Stricter
than a hash: on mismatch it reports the first differing rows.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from kinesis_test_spark.sources import TABLES

NULL = "␀"  # sentinel for SQL NULL


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLES:
        # layout-adaptive, mirroring the Spark readers: the driver fixture
        # is one FILE named <table>.parquet, a restaged dir (multi-file
        # layout-invariance sweeps, bench --restaged) is a DIRECTORY of
        # part files under the same name
        path = f"{sf_dir}/{name}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def canon_value(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, float):
        if math.isnan(v):
            return NULL
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return NULL
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, str):
        return v
    # arrays / lists / numpy
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return canon_value(v.item())
        if isinstance(v, np.ndarray):
            return "[" + ",".join(canon_value(x) for x in v.tolist()) + "]"
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    if pd.isna(v):
        return NULL
    return str(v)


def canon_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of problems (empty == parity)."""
    spdf = spark_df.toPandas()
    problems: list[str] = []
    s_cols, o_cols = sorted(spdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"schema mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = canon_frame(spdf), canon_frame(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_rows, o_rows))
            if a != b
        ]
        extra = abs(len(s_rows) - len(o_rows))
        for i, a, b in diffs[:5]:
            problems.append(f"row {i}: spark={a} oracle={b} (cols={s_cols})")
        if not diffs and extra:
            problems.append(f"tail rows differ (len {len(s_rows)} vs {len(o_rows)})")
        if diffs and len(diffs) > 5:
            problems.append(f"... {len(diffs)} differing rows total")
    return problems


def check_query(spark, sf_dir: str, name: str) -> list[str]:
    from kinesis_test_spark import registry

    registry.load_all()
    fn = registry.QUERIES[name]
    sql = registry.ORACLES.get(name)
    df = fn(spark, sf_dir)
    if sql is None:
        n = df.count()  # rows-only check
        return [] if n >= 0 else [f"{name}: negative count?"]
    con = duck_con(sf_dir)
    try:
        oracle_pdf = con.execute(sql).df()
    finally:
        con.close()
    return compare(df, oracle_pdf)
