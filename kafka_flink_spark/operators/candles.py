"""OHLCV candlestick aggregation — the engine's flagship operator.

Semantics (reference ``3_ohlc.py:19-23``, ``old/flink.py:47-50``): per
grouping key and time bucket — ``open`` = price of first event,
``close`` = price of last event, ``high`` = max price, ``low`` = min
price, ``volume`` = sum of qty.

Spark-first design notes
------------------------
* The reference buffers whole windows in Python lists
  (``3_ohlc.py:16-23``) or hand-rolls per-key pickled state
  (``7_ohlc.py:35-84``). Here the entire aggregate is declarative:
  ``groupBy(window(ts, d), key).agg(...)`` — Catalyst plans a partial
  (map-side) aggregate before the shuffle, so each of the N input
  partitions contributes at most |keys|×|buckets| rows to the
  exchange. At 100 TB that partial aggregation is what keeps the
  shuffle proportional to the *result* size, not the input size.
* ``open``/``close`` use ``min_by``/``max_by`` over a ``(ts, seq)``
  struct — deterministic, unlike Spark's ``first()``/``last()`` (which
  are order-nondeterministic) and unlike the reference's reliance on
  Kafka arrival order (SURVEY.md §4.2.1/§7.4.4). ``min_by``/``max_by``
  have partial-aggregate implementations, so determinism costs no
  extra shuffle.
* Every helper returns a lazy DataFrame; no collect(), no driver-side
  loops.
* Key skew needs no salting here: with partial (map-side) aggregation
  a hot key contributes at most one pre-aggregated row per map task to
  the shuffle, so the reducer for ``Product_0`` receives ≤ #tasks rows
  no matter how many billions of events that key has. Salting matters
  for joins (AQE's skew-join splitting covers that), not for algebraic
  aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_key(ts_col: str, seq_col: str | None) -> Column:
    """Event-order key: ts, tie-broken by a monotonic sequence column
    (kafka offset / event_id) when available."""
    if seq_col is None:
        return F.col(ts_col)
    return F.struct(F.col(ts_col).alias("ts"), F.col(seq_col).alias("seq"))


def ohlcv_aggs(
    ts_col: str = "ts",
    price_col: str = "price",
    qty_col: str = "qty",
    seq_col: str | None = None,
) -> list[Column]:
    """The five OHLCV aggregate expressions (A1/A6/A9/A10)."""
    key = _order_key(ts_col, seq_col)
    return [
        F.min_by(price_col, key).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, key).alias("close"),
        F.sum(qty_col).cast("long").alias("volume"),
    ]


def ohlcv(
    df: DataFrame,
    window_duration: str = "1 minute",
    key_col: str = "product",
    ts_col: str = "ts",
    price_col: str = "price",
    qty_col: str = "qty",
    seq_col: str | None = None,
) -> DataFrame:
    """Tumbling-window OHLCV candles (A1, A5, A6).

    Spark's ``window()`` buckets are epoch-aligned, matching the
    reference's ``(minute // d) * d`` alignment (``7_ohlc.py:64``).
    Output: window_start, window_end, <key>, open, high, low, close,
    volume — schema per FIXTURES.md §A3.
    """
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(*ohlcv_aggs(ts_col, price_col, qty_col, seq_col))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def ohlcv_cascade(candles: DataFrame, window_duration: str, key_col: str = "product") -> DataFrame:
    """Re-aggregate finer candles into coarser ones (multi-resolution,
    reference ``old/flink.py:70-79`` runs 1-min and 5-min pipelines).

    The cascade (1-min → 5-min) reads the *already reduced* candle set
    instead of rescanning raw events — at scale this is the difference
    between aggregating 100 TB twice and aggregating it once plus a
    few GB. open/close compose via min_by/max_by on window_start.
    """
    return (
        candles.groupBy(F.window("window_start", window_duration).alias("w"), F.col(key_col))
        .agg(
            F.min_by("open", F.col("window_start")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col("window_start")).alias("close"),
            F.sum("volume").cast("long").alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def running_ohlcv(
    df: DataFrame,
    key_col: str = "product",
    ts_col: str = "ts",
    price_col: str = "price",
    qty_col: str = "qty",
    seq_col: str | None = None,
    window_duration: str | None = None,
) -> DataFrame:
    """Per-event running OHLCV — the batch re-expression of the
    reference's update-mode emission (A2-A5, ``4_ohlc.py:47-56``,
    ``5_ohlc.py:99``): every input row is emitted with the running
    open/high/low/close/volume of its key so far.

    ``window_duration=None`` reproduces A2 (cumulative, never resets,
    ``4_ohlc.py``); a duration adds the manual tumbling-window reset of
    A3/A5 (``5_ohlc.py:72``) by partitioning the OVER-window on the
    epoch-aligned bucket as well.
    """
    from pyspark.sql.window import Window

    parts = [key_col]
    out_cols = [df[c] for c in df.columns]
    if window_duration is not None:
        df = df.withColumn("w", F.window(ts_col, window_duration))
        df = df.withColumn("window_start", F.col("w.start")).drop("w")
        parts.append("window_start")
        out_cols = [df[c] for c in df.columns]
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        *out_cols,
        F.first(price_col).over(w).alias("open"),
        F.max(price_col).over(w).alias("high"),
        F.min(price_col).over(w).alias("low"),
        F.last(price_col).over(w).alias("close"),
        F.sum(qty_col).over(w).cast("long").alias("volume"),
    )


def to_json_rows(candles: DataFrame, key_col: str = "product") -> DataFrame:
    """P1 — project candles to the reference's JSON wire shape
    (``3_ohlc.py:69-77``): formatted window_start/window_end strings +
    metrics, serialized with ``to_json``. Single narrow projection,
    fully codegen'd JVM-side (the reference did this per-row in
    Python)."""
    return candles.select(
        F.to_json(
            F.struct(
                F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
                F.col(key_col),
                "open",
                "high",
                "low",
                "close",
                "volume",
            )
        ).alias("value")
    )


def nested_sink_shape(candles: DataFrame, key_col: str = "product") -> DataFrame:
    """K5 — the Table-API sink's nested ``ohlc ROW<open,high,low,close>``
    schema (reference ``old/kfk.py:166-173``)."""
    return candles.select(
        "window_start",
        F.col(key_col),
        F.struct("open", "high", "low", "close").alias("ohlc"),
        "volume",
    )


def ohlcv_python_fold(
    trades: DataFrame,
    window_duration: str = "1 hour",
    key_col: str = "product",
    ts_col: str = "ts",
    price_col: str = "price",
    qty_col: str = "qty",
    seq_col: str = "seq",
) -> DataFrame:
    """OHLCV computed by Python code over each window's buffered rows
    (A7/U5 — the reference's ``calculate_ohlc`` UDF over a collected
    list, ``old/kfk.py:35-50``), via the scalable grouped-UDF pattern:

    ``repartition(keys) → sortWithinPartitions(keys, ts, seq) →
    mapInPandas`` with a vectorized pandas groupby per Arrow batch.

    Why not ``groupBy().applyInPandas``: that launches one Python
    function call (plus pandas frame construction) PER GROUP — at
    hourly×product granularity that's millions of tiny groups at scale
    and the per-group overhead dominates (measured 11.8s vs ~2s at
    sf0.1 here). mapInPandas amortizes the overhead over whole Arrow
    batches; since a group can straddle a batch boundary, the fold
    carries the last partial aggregate across batches of the
    (key-sorted) partition and merges on key continuation.
    """
    from collections.abc import Iterator

    import pandas as pd  # noqa: F401

    with_ws = trades.withColumn("window_start", F.window(ts_col, window_duration).start)
    parted = with_ws.repartition("window_start", F.col(key_col)).sortWithinPartitions(
        "window_start", key_col, ts_col, seq_col
    )
    out_schema = (
        "window_start timestamp, product string, open double, high double, "
        "low double, close double, volume long"
    )

    def merge(carry: dict, nxt: dict) -> dict:
        return {
            "window_start": carry["window_start"],
            "product": carry["product"],
            "open": carry["open"],
            "high": max(carry["high"], nxt["high"]),
            "low": min(carry["low"], nxt["low"]),
            "close": nxt["close"],
            "volume": carry["volume"] + nxt["volume"],
        }

    def fold(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        carry: dict | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            g = (
                pdf.groupby(["window_start", key_col], sort=False, as_index=False)
                .agg(
                    open=(price_col, "first"),
                    high=(price_col, "max"),
                    low=(price_col, "min"),
                    close=(price_col, "last"),
                    volume=(qty_col, "sum"),
                )
                .rename(columns={key_col: "product"})
            )
            rows = g.to_dict("records")
            if carry is not None:
                if (
                    rows
                    and rows[0]["window_start"] == carry["window_start"]
                    and rows[0]["product"] == carry["product"]
                ):
                    rows[0] = merge(carry, rows[0])
                else:
                    rows.insert(0, carry)
            if rows:
                carry = rows.pop()
            if rows:
                yield pd.DataFrame(rows)
        if carry is not None:
            yield pd.DataFrame([carry])

    return parted.mapInPandas(fold, out_schema)
