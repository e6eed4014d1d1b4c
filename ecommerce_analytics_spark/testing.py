"""Differential-testing harness: Spark result vs DuckDB oracle.

Replicates the driver's correctness gate locally (SURVEY.md §5.2):
run the PySpark query and its ANSI-SQL oracle on the same parquet,
compare row count, column names, and an order-insensitive value
multiset with float tolerance.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb
import pandas as pd

from ecommerce_analytics_spark.schemas import DRIVER_TABLES

FLOAT_SIG_DIGITS = 9


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in DRIVER_TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # round to FLOAT_SIG_DIGITS significant digits
        return round(v, FLOAT_SIG_DIGITS - 1 - int(math.floor(math.log10(abs(v)))))
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if pd.isna(v):
        return None
    return v


def _normalize(df: pd.DataFrame) -> tuple[list[str], Counter]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = Counter()
    for row in df.itertuples(index=False, name=None):
        rows[tuple(_norm_cell(v) for v in row)] += 1
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                   name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)")
    s_cols, s_rows = _normalize(spark_pdf)
    o_cols, o_rows = _normalize(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"{name}: columns {s_cols} != {o_cols}")
        return problems
    if s_rows != o_rows:
        only_spark = list((s_rows - o_rows).items())[:3]
        only_oracle = list((o_rows - s_rows).items())[:3]
        problems.append(
            f"{name}: value mismatch; spark-only sample={only_spark} "
            f"oracle-only sample={only_oracle}")
    return problems
