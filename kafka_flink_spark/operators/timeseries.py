"""Exponentially weighted moving average (EWMA) as a window operator.

The reference has no smoothing operator at all (its OHLC jobs emit raw
window aggregates, ``5_ohlc.py:27-112``); EWMA is the standard next
step every metrics/quant consumer applies, and pandas ships it as
``Series.ewm(alpha).mean()``. This is that operator, distributed.

Semantics: pandas ``ewm(alpha, adjust=True)`` —

    s_n = Σ_{j=0..n-1} (1-α)^j · x_{n-j}  /  Σ_{j=0..n-1} (1-α)^j

TRUNCATED at ``max_lags`` terms: weights decay geometrically, so the
dropped tail's relative contribution is bounded by (1-α)^max_lags
(α=0.3, K=48 → 3.8e-8; the output is rounded to 6 decimals, below
that bound's reach for values in the fixture range). Truncation is
what makes the operator SCALE-SAFE: the exact recursive form needs
either a sequential scan per key (not distributed) or unbounded
(1-α)^(-i) rescaling that overflows doubles after ~2 000 rows; the
truncated form is a fixed bank of ``lag()`` expressions over one
window — bounded memory, any series length, no overflow.

Plan shape: ``row_number`` + K ``lag()`` expressions share one
``(key, order)`` window spec, so Catalyst plans a SINGLE Window
operator fed by one exchange+sort — the aggregate-sized rows shuffle
once, the weight arithmetic is pure codegen projection. No Python, no
HOF lambdas (the per-row loop is unrolled at PLAN BUILD time into K
column expressions, not interpreted per row).

Cross-engine determinism (for the DuckDB oracle): the weights and the
prefix-sum denominators are baked as ``repr()`` round-trip double
LITERALS shared by both engines via :func:`ewma_weights`; numerator
terms are summed left-to-right in lag order on both sides, so every
intermediate is the identical IEEE double and the rounded output
hash-matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ewma_weights(alpha: float, max_lags: int) -> tuple[list[float], list[float]]:
    """(weights, denoms): ``weights[j] = (1-α)^j`` for j in
    [0, max_lags) and ``denoms[n-1] = Σ_{j<n} weights[j]`` — the
    adjust=True normalizer for a row with ``min(row_number, K)``
    available terms. Both engines consume these as literals."""
    w: list[float] = []
    acc = 1.0
    for _ in range(max_lags):
        w.append(acc)
        acc *= 1.0 - alpha
    denoms: list[float] = []
    s = 0.0
    for x in w:
        s += x
        denoms.append(s)
    return w, denoms


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Column,
    value_col: str,
    alpha: float = 0.3,
    max_lags: int = 48,
    out_col: str = "ewma",
    round_to: int = 6,
) -> DataFrame:
    """Append ``out_col`` = truncated adjust=True EWMA of
    ``value_col`` per key, ordered by ``order_col``. ``value_col``
    must be non-null (aggregate a dense series first — e.g. the
    gap-filled closes from ``operators/resample``)."""
    weights, denoms = ewma_weights(alpha, max_lags)
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    num: Column = F.col(value_col) * F.lit(weights[0])
    for j in range(1, max_lags):
        num = num + F.coalesce(F.lag(value_col, j).over(w), F.lit(0.0)) * F.lit(
            weights[j]
        )
    rn = F.row_number().over(w)
    denom = F.element_at(
        F.array(*[F.lit(d) for d in denoms]), F.least(rn, F.lit(max_lags))
    )
    return df.withColumn(out_col, F.round(num / denom, round_to))


def ewma_oracle_sql(
    value_expr: str,
    partition_by: str,
    order_by: str,
    alpha: float = 0.3,
    max_lags: int = 48,
    round_to: int = 6,
) -> str:
    """The DuckDB expression computing the identical truncated EWMA:
    same literals (``repr`` round-trip), same left-to-right summation
    order, same least(row_number, K) denominator lookup."""
    weights, denoms = ewma_weights(alpha, max_lags)
    over = f"OVER (PARTITION BY {partition_by} ORDER BY {order_by})"
    terms = [f"({value_expr}) * {weights[0]!r}"]
    terms += [
        f"coalesce(lag({value_expr}, {j}) {over}, 0.0) * {weights[j]!r}"
        for j in range(1, max_lags)
    ]
    num = " + ".join(terms)
    denom_list = ", ".join(repr(d) for d in denoms)
    denom = f"list_extract([{denom_list}], least(row_number() {over}, {max_lags}))"
    return f"round(({num}) / {denom}, {round_to})"


HOLT_SCALE = 10**12


def holt_linear(
    daily: DataFrame,
    key_col: str = "event_type",
    x_col: str = "x",
    t_col: str = "d",
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (Holt 1957)
    with alpha = beta = 1/2, run as the TRUE recursion in INTEGER
    fixed point (the gr1/gr7 discipline — scaled longs, units of
    1/HOLT_SCALE):

        L_t = (X_t + L_{t-1} + B_{t-1}) >> 1
        B_t = (L_t - L_{t-1} + B_{t-1}) >> 1

    with X_t = x_t * HOLT_SCALE, initialized textbook-style
    (L_1 = X_1, B_1 = X_2 - X_1). The arithmetic right shift IS the
    halving — it floors identically in Python and every SQL engine's
    BIGINT `>>`, so each step is bit-reproducible and the DuckDB
    recursive-CTE oracle hash-matches exactly. (A first float draft
    with exact-dyadic 0.5 multiplies failed the oracle in the 6th
    decimal: dyadic values land exactly ON the round-half boundary,
    where Python banker's-rounds and SQL engines round half-away —
    integer fixed point has no rounding at all.) Emits per (key, t):
    the count, level/trend/one-step-ahead forecast as *_e12 longs.

    Scale shape: the recursion is inherently sequential PER KEY, so it
    runs in applyInPandas — but only AFTER the corpus-scale work (the
    daily aggregation) has reduced the data to |keys| x |days| rows.
    Python touches aggregate-sized rows, never events; each key's
    series lives in one task; keys parallelize across the cluster.
    Headroom: |X| <= count_max * 1e12 — int64-safe through counts of
    ~9e6/day/key; the recursion keeps |L| near max |X|.
    ``daily`` must carry one row per (key, t) (the recursion steps
    over OBSERVED rows in t order)."""
    import pandas as pd

    out_schema = (
        f"{key_col} string, {t_col} long, x long, "
        "level_e12 long, trend_e12 long, forecast_next_e12 long"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col).reset_index(drop=True)
        xs = [int(v) * HOLT_SCALE for v in pdf[x_col]]
        n = len(xs)
        levels: list[int] = []
        trends: list[int] = []
        if n == 1:
            levels, trends = [xs[0]], [0]
        elif n >= 2:
            l_prev = xs[0]
            b_prev = xs[1] - xs[0]
            levels, trends = [l_prev], [b_prev]
            for t in range(1, n):
                l_new = (xs[t] + l_prev + b_prev) >> 1
                b_new = (l_new - l_prev + b_prev) >> 1
                levels.append(l_new)
                trends.append(b_new)
                l_prev, b_prev = l_new, b_new
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                t_col: pdf[t_col],
                "x": [v // HOLT_SCALE for v in xs],
                "level_e12": levels,
                "trend_e12": trends,
                "forecast_next_e12": [
                    lv + tr for lv, tr in zip(levels, trends)
                ],
            }
        )

    return daily.groupBy(key_col).applyInPandas(fit, out_schema)


def holt_winters(
    daily: DataFrame,
    period: int = 7,
    key_col: str = "event_type",
    x_col: str = "x",
    t_col: str = "d",
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing (Winters
    1960) with alpha = beta = gamma = 1/2 and season length
    ``period`` — :func:`holt_linear` plus a rotating seasonal-index
    state, completing the forecasting pair (weekly-periodic daily
    series are exactly what the plain Holt trend mis-extrapolates).
    Same integer fixed-point discipline (scaled longs, units of
    1/HOLT_SCALE; the arithmetic right shift IS every halving, which
    floors identically in Python and BIGINT ``>>`` — including for
    negative seasonal deviations, so each step is bit-reproducible):

        L_t = ((X_t - S_{t-m}) + L_{t-1} + B_{t-1}) >> 1
        B_t = ((L_t - L_{t-1}) + B_{t-1}) >> 1
        S_t = ((X_t - L_t) + S_{t-m}) >> 1
        forecast_{t+1} = L_t + B_t + S_{t+1-m}

    Shift-only naive initialization from the first ``period``
    observations (no division, so no cross-engine floor-semantics
    trap): L = X_1, B = 0, S_i = X_i - X_1 for i = 1..m; the
    recursion emits rows from t = m+1 on (keys with <= m observed
    rows emit nothing — both engines agree). Oracle: a recursive CTE
    whose row state carries the m seasonal values as a LIST, rotated
    with ``list_append(seas[2:m], S_t)`` each step.

    Scale shape identical to holt_linear: the recursion is
    sequential PER KEY over aggregate-sized rows (applyInPandas
    after the corpus-scale daily aggregation); Python never touches
    events, keys parallelize. The recursion steps over OBSERVED rows
    in t order (same caveat as holt_linear: gap-fill first if
    calendar alignment matters).
    """
    import pandas as pd

    out_schema = (
        f"{key_col} string, {t_col} long, x long, level_e12 long, "
        "trend_e12 long, seasonal_e12 long, forecast_next_e12 long"
    )
    m = int(period)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col).reset_index(drop=True)
        xs = [int(v) * HOLT_SCALE for v in pdf[x_col]]
        n = len(xs)
        if n <= m:
            return pd.DataFrame(
                {c.split()[0]: [] for c in out_schema.split(", ")}
            ).astype({t_col: "int64"}, errors="ignore")
        level = xs[0]
        trend = 0
        seas = [x - xs[0] for x in xs[:m]]  # oldest -> newest
        rows = []
        for t in range(m, n):  # 0-based; emits observation t+1 = m+1..n
            s_old = seas[0]
            l_new = ((xs[t] - s_old) + level + trend) >> 1
            b_new = ((l_new - level) + trend) >> 1
            s_new = ((xs[t] - l_new) + s_old) >> 1
            seas = seas[1:] + [s_new]
            level, trend = l_new, b_new
            rows.append(
                (
                    pdf[key_col].iloc[t],
                    int(pdf[t_col].iloc[t]),
                    xs[t] // HOLT_SCALE,
                    level,
                    trend,
                    s_new,
                    level + trend + seas[0],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                key_col, t_col, "x", "level_e12", "trend_e12",
                "seasonal_e12", "forecast_next_e12",
            ],
        )

    return daily.groupBy(key_col).applyInPandas(fit, out_schema)
