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


def test_cusum_matches_python_recursion(spark):
    """e18 pins its closed prefix form S_d = C_d - min(0, min C_j)
    against the textbook sequential recursion max(0, S + x) on an
    injected level shift: 15 quiet days (~10 events/day) then 15 loud
    days (~30/day). The shift must flag; the quiet reference half
    must not."""
    import datetime as dt
    import math
    import unittest.mock as mock

    from kafka_flink_spark.suite import events_queries
    from kafka_flink_spark.suite.events_queries import e18_cusum_changepoint

    rows = []
    eid = 0
    counts = []
    for d in range(30):
        n = (10 + d % 3) if d < 15 else (30 + d % 3)
        counts.append(n)
        for _ in range(n):
            rows.append((eid, dt.datetime(2021, 1, 1 + d), 1, "click", 0.0, ""))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with mock.patch.object(events_queries, "load_table", return_value=ev):
        out = sorted(
            e18_cusum_changepoint(spark, "unused").collect(), key=lambda r: r.day
        )

    # python reference: stats over the first half (days 0..15 inclusive
    # of the midpoint rule: 2*(d-mn) <= (mx-mn) -> d <= 14.5 -> 0..14)
    ref = counts[:15]
    mu = sum(ref) / len(ref)
    sigma = math.sqrt(max(sum(c * c for c in ref) / len(ref) - mu * mu, 0))
    sp = sm = 0.0
    for i, r in enumerate(out):
        sp = max(0.0, sp + (counts[i] - mu - 0.5 * sigma))
        sm = max(0.0, sm - (counts[i] - mu + 0.5 * sigma))
        assert abs(r.cusum_pos - round(sp, 6)) < 1e-6, (i, r.cusum_pos, sp)
        assert abs(r.cusum_neg - round(sm, 6)) < 1e-6, (i, r.cusum_neg, sm)
    # the level shift flags (and stays flagged); the reference half doesn't
    assert not any(r.is_change for r in out[:15])
    assert all(r.is_change for r in out[17:])


def test_seasonal_decompose_matches_statsmodels_formula(spark):
    """e19 pinned against a hand NumPy/classical reference on a
    synthetic series with a known weekly pattern: constant base 20,
    weekday w adds w events — trend recovers the flat base + mean
    seasonal lift, decomposition reconstructs n = trend + seasonal +
    remainder wherever all terms are defined."""
    import datetime as dt
    import unittest.mock as mock

    from kafka_flink_spark.suite import events_queries
    from kafka_flink_spark.suite.events_queries import e19_seasonal_decompose

    rows, eid = [], 0
    start = dt.datetime(2021, 3, 1)  # a Monday
    counts = {}
    for d in range(28):
        day = start + dt.timedelta(days=d)
        w = (day.weekday() + 1) % 7  # python Mon=0 -> Sunday-0 convention
        n = 20 + w
        counts[day.date()] = n
        for _ in range(n):
            rows.append((eid, day, 1, "click", 0.0, ""))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    with mock.patch.object(events_queries, "load_table", return_value=ev):
        out = sorted(
            e19_seasonal_decompose(spark, "unused").collect(), key=lambda r: r.day
        )

    assert len(out) == 28
    # python reference with the same integer-exact formulation
    days = sorted(counts)
    ns = [counts[d] for d in days]
    sum7 = {
        i: sum(ns[i - 3 : i + 4]) for i in range(3, 25)
    }  # full windows only
    num = {i: 7 * ns[i] - sum7[i] for i in sum7}
    by_wd = {}
    for i in num:
        wd = (days[i].weekday() + 1) % 7
        by_wd.setdefault(wd, []).append(num[i])
    for i, r in enumerate(out):
        if i in sum7:
            assert abs(r.trend - round(sum7[i] / 7.0, 6)) < 1e-9
        else:
            assert r.trend is None
        wd = (days[i].weekday() + 1) % 7
        assert r.weekday == wd
        if wd in by_wd:
            s = sum(by_wd[wd]) / (7.0 * len(by_wd[wd]))
            assert abs(r.seasonal - round(s, 6)) < 1e-9
        if i in num and wd in by_wd:
            rem = (num[i] * len(by_wd[wd]) - sum(by_wd[wd])) / (7.0 * len(by_wd[wd]))
            assert abs(r.remainder - round(rem, 6)) < 1e-9
            # reconstruction n = trend + seasonal + remainder (to rounding)
            assert abs((r.trend + r.seasonal + r.remainder) - r.n) < 5e-6


def test_km_survival_matches_python_reference(spark):
    """e20 against a hand KM computation: censored customers stay in
    the risk sets they survived through but never count as events;
    survival steps down only at event times; curve matches the
    textbook product-limit formula."""
    import datetime as dt
    import unittest.mock as mock

    from kafka_flink_spark.suite import events_queries
    from kafka_flink_spark.suite.events_queries import e20_survival_km

    d0 = dt.datetime(2020, 1, 1)

    def order(k, cust, day):
        return (k, cust, "O", 10.0, d0 + dt.timedelta(days=day), "1-URGENT")

    rows = []
    k = 0
    # end of observation = day 400 (customer 9's last order)
    # churned (last order > 90 days before day 400):
    #   cust 1: first 0,  last 100 -> dur 100, event
    #   cust 2: first 0,  last 100 -> dur 100, event (tie)
    #   cust 3: first 50, last 250 -> dur 200, event
    # censored (active within the last 90 days):
    #   cust 4: first 0,   last 350 -> dur 400, censored
    #   cust 9: first 150, last 400 -> dur 250, censored
    for cust, (f, l) in {1: (0, 100), 2: (0, 100), 3: (50, 250),
                         4: (0, 350), 9: (150, 400)}.items():
        rows.append(order(k, cust, f)); k += 1
        rows.append(order(k, cust, l)); k += 1
    o = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with mock.patch.object(events_queries, "load_table", return_value=o):
        out = {r.t_days: r for r in e20_survival_km(spark, "x").collect()}

    # durations: 100(e),100(e),200(e),400(c),250(c)
    # t=100: n_risk=5, d=2 -> S=0.6 ; t=200: n_risk=3, d=1 -> S=0.4
    assert set(out) == {100, 200}
    assert out[100].n_risk == 5 and out[100].n_events == 2
    assert abs(out[100].survival - 0.6) < 1e-9
    assert out[200].n_risk == 3 and out[200].n_events == 1
    assert abs(out[200].survival - 0.4) < 1e-9
    assert abs(out[200].hazard - round(1 / 3, 6)) < 1e-9


def test_holt_linear_tracks_trend_and_matches_reference(spark):
    """e22: on a clean linear series x_t = 10 + 5t the smoother locks
    onto the line — level converges to x_t and trend to the true slope
    (alpha=beta=1/2 reaches it exactly by t=2 for exact-linear input:
    L_1=X_1, B_1=X_2-X_1 seeds ON the line and the recursion is a
    fixed point there) — and the operator equals a hand-rolled Python
    reference of the shifted recursion on an irregular series."""
    from kafka_flink_spark.operators.timeseries import HOLT_SCALE, holt_linear

    # exact line: level == x, trend == slope, forecast == next x
    line = [(f"k", t, 10 + 5 * t) for t in range(1, 11)]
    df = spark.createDataFrame(line, "event_type string, d long, x long")
    rows = {r.d: r for r in holt_linear(df).collect()}
    for t in range(2, 11):
        assert rows[t].level_e12 == (10 + 5 * t) * HOLT_SCALE
        assert rows[t].trend_e12 == 5 * HOLT_SCALE
        assert rows[t].forecast_next_e12 == (10 + 5 * (t + 1)) * HOLT_SCALE

    # irregular series vs the reference recursion
    xs = [7, 3, 11, 2, 2, 30]
    df2 = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "event_type string, d long, x long"
    )
    got = {r.d: (r.level_e12, r.trend_e12) for r in holt_linear(df2).collect()}
    X = [v * HOLT_SCALE for v in xs]
    l, b = X[0], X[1] - X[0]
    want = {0: (l, b)}
    for t in range(1, len(X)):
        l_new = (X[t] + l + b) >> 1
        b = (l_new - l + b) >> 1
        l = l_new
        want[t] = (l, b)
    assert got == want


def test_holt_winters_reference_and_convergence(spark):
    """holt_winters vs an inline Python reference of the same triple
    recursion (exact integer equality, every row), on a series with a
    pure weekly pattern plus linear trend: x_t = 100 + 3t + p[t%7].
    On such a series the one-step-ahead forecast must CONVERGE: the
    mean absolute forecast error over the last week is far below the
    seasonal amplitude (plain Holt cannot do this — the seasonal term
    is load-bearing), and the final seasonal state reflects the
    pattern's shape (positive for the peak weekday, negative for the
    trough)."""
    from kafka_flink_spark.operators.timeseries import HOLT_SCALE, holt_winters

    pat = [0, 40, -30, 10, -20, 25, -25]
    xs = [100 + 3 * t + pat[t % 7] for t in range(35)]
    daily = spark.createDataFrame(
        [("k", t, x) for t, x in enumerate(xs)],
        "event_type string, d long, x long",
    )
    got = sorted(holt_winters(daily).collect(), key=lambda r: r.d)
    assert [r.d for r in got] == list(range(7, 35))

    # inline reference
    sx = [x * HOLT_SCALE for x in xs]
    level, trend = sx[0], 0
    seas = [v - sx[0] for v in sx[:7]]
    ref = {}
    for t in range(7, 35):
        s_old = seas[0]
        l_new = ((sx[t] - s_old) + level + trend) >> 1
        b_new = ((l_new - level) + trend) >> 1
        s_new = ((sx[t] - l_new) + s_old) >> 1
        seas = seas[1:] + [s_new]
        level, trend = l_new, b_new
        ref[t] = (l_new, b_new, s_new, level + trend + seas[0])
    for r in got:
        assert (
            r.level_e12, r.trend_e12, r.seasonal_e12, r.forecast_next_e12
        ) == ref[r.d], r.d

    # convergence: last-week forecasts track the known next values
    errs = [
        abs(r.forecast_next_e12 / HOLT_SCALE - xs[r.d + 1])
        for r in got
        if 27 <= r.d <= 33
    ]
    assert sum(errs) / len(errs) < 5.0, errs  # amplitude is 70
