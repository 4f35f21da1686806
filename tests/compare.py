"""Order-insensitive frame comparison mirroring the driver's correctness
check: sort columns by name, normalize every cell to a canonical string,
sort rows, compare exactly. Doubles are compared via repr (bit-exact) —
the engine guarantees bit-equality through exact decimal arithmetic
(csv2db_spark/functions/numeric.py)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import numpy as np
import pandas as pd


def norm_cell(v) -> str:
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return "NULL" if pd.isna(v) else v.isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if v is pd.NaT or (isinstance(v, type(pd.NA)) and v is pd.NA):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str):
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s_rows = canonical_rows(spark_df)
    o_rows = canonical_rows(oracle_df)
    if s_rows != o_rows:
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_rows, o_rows))
            if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (row_idx, spark, oracle): {diffs}"
        )
