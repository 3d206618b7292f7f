"""Differential-test helpers mimicking the driver's comparison:
row count + column names + order-insensitive canonicalized values."""

from __future__ import annotations

import math
from typing import Any

import pandas as pd


def canon_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))  # 3.0 == 3 across engine int/float quirks
        return repr(v)
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
