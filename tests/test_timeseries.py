"""Semantics pins for the time-series operators: truncated EWMA vs
pandas (the reference semantics it reimplements), linear interpolation
on hand-crafted gap series."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F


def _hours(n: int) -> list[dt.datetime]:
    t0 = dt.datetime(2024, 1, 1)
    return [t0 + dt.timedelta(hours=i) for i in range(n)]


def test_ewma_matches_pandas_below_truncation(spark):
    """For series shorter than max_lags the truncated EWMA IS the
    exact pandas ewm(alpha, adjust=True).mean() — pin against pandas
    on two keys with different lengths."""
    from kafka_flink_spark.operators.timeseries import ewma

    vals_a = [10.0, 12.0, 11.0, 15.0, 14.0, 13.5, 18.0]
    vals_b = [5.0, 5.5, 4.0]
    rows = [("a", t, v) for t, v in zip(_hours(len(vals_a)), vals_a)]
    rows += [("b", t, v) for t, v in zip(_hours(len(vals_b)), vals_b)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")

    got = {
        (r["k"], r["ts"]): r["ewma"]
        for r in ewma(
            df, key_cols=["k"], order_col="ts", value_col="v", alpha=0.3
        ).collect()
    }
    for key, vals in (("a", vals_a), ("b", vals_b)):
        expect = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
        for t, e in zip(_hours(len(vals)), expect):
            assert got[(key, t)] == pytest.approx(e, abs=1e-6), (key, t)


def test_ewma_truncation_bounds_long_series(spark):
    """Beyond max_lags the dropped tail's weight is < (1-a)^K: on a
    constant series the truncated EWMA is exactly the constant (the
    normalizer matches the kept weights), regardless of length."""
    from kafka_flink_spark.operators.timeseries import ewma

    n = 120  # > max_lags=48
    df = spark.createDataFrame(
        [("k", t, 7.5) for t in _hours(n)], "k string, ts timestamp, v double"
    )
    out = ewma(df, key_cols=["k"], order_col="ts", value_col="v").collect()
    assert len(out) == n
    assert all(r["ewma"] == pytest.approx(7.5, abs=1e-9) for r in out)


def test_interpolate_linear_crafted_gaps(spark):
    """1, NULL, NULL, 4 hourly -> 2, 3; leading/trailing gaps take the
    nearest known value; known rows pass through untouched."""
    from kafka_flink_spark.operators.resample import interpolate_linear

    ts = _hours(6)
    vals = [None, 1.0, None, None, 4.0, None]
    df = spark.createDataFrame(
        [("k", t, v) for t, v in zip(ts, vals)], "k string, ts timestamp, v double"
    )
    out = interpolate_linear(df, ["k"], "ts", "v", out_col="vi")
    got = [r["vi"] for r in out.orderBy("ts").collect()]
    assert got == pytest.approx([1.0, 1.0, 2.0, 3.0, 4.0, 4.0])


def test_interpolate_linear_uneven_spacing(spark):
    """The lerp weights by TIME, not row index: a gap at 25% of the
    span interpolates to 25% of the value delta."""
    from kafka_flink_spark.operators.resample import interpolate_linear

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", t0, 0.0),
        ("k", t0 + dt.timedelta(hours=1), None),
        ("k", t0 + dt.timedelta(hours=4), 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        r["ts"]: r["v"]
        for r in interpolate_linear(df, ["k"], "ts", "v").collect()
    }
    assert out[t0 + dt.timedelta(hours=1)] == pytest.approx(2.0)
