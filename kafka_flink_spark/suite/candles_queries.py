"""Candle (OHLCV) queries — the reference's semantic core.

Covers SURVEY.md §2.5 A1-A10 (batch re-expressions; streaming forms
live in streaming_queries.py) over the ``trades`` view derived from
the ``events`` fixture (FIXTURES.md role mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_spark.operators.candles import (
    nested_sink_shape,
    ohlcv,
    ohlcv_cascade,
    running_ohlcv,
)
from kafka_flink_spark.sources.fixtures import TRADES_ORACLE_CTE, load_tables, trades_view
from kafka_flink_spark.suite import register

# Shared string-rendering of window bounds (see suite/__init__ notes).
_FMT = "yyyy-MM-dd HH:mm:ss"


def _strfmt_windows(df: DataFrame) -> DataFrame:
    cols = [
        F.date_format(c, _FMT).alias(c) if c in ("window_start", "window_end") else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def _candles_oracle(bucket: str, group_cols: str = "product") -> str:
    """DuckDB oracle for epoch-aligned tumbling OHLCV at a given bucket
    (e.g. ``1 hour``). Spark window() aligns to epoch; for whole
    hour/minute buckets date_trunc matches (SURVEY.md §7.4.5)."""
    unit = bucket.split()[1].rstrip("s")
    assert bucket.split()[0] == "1", "use _candles_oracle only for unit buckets"
    gcols = ", ".join(group_cols.split(","))
    return f"""
WITH {TRADES_ORACLE_CTE}
SELECT strftime(date_trunc('{unit}', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('{unit}', ts) + INTERVAL 1 {unit}, '%Y-%m-%d %H:%M:%S') AS window_end,
       {gcols},
       arg_min(price, ts) AS open,
       max(price) AS high,
       min(price) AS low,
       arg_max(price, ts) AS close,
       CAST(sum(qty) AS BIGINT) AS volume
FROM trades
GROUP BY ALL
"""


@register(
    "a1_ohlcv_tumbling_1h",
    oracle=_candles_oracle("1 hour"),
    doc="A1/A5: tumbling-window OHLCV per product (reference 3_ohlc.py:13-25, "
    "7_ohlc.py:35-98) — window() + min_by/max_by/max/min/sum.",
)
def a1_ohlcv_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _strfmt_windows(ohlcv(trades_view(spark, sf_dir), "1 hour", seq_col="seq"))


@register(
    "a6_sql_ohlc_5m",
    oracle=f"""
WITH {TRADES_ORACLE_CTE}
SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       instrument_id,
       product,
       max(price) AS high,
       min(price) AS low,
       arg_min(price, ts) AS open,
       arg_max(price, ts) AS close
FROM trades
GROUP BY ALL
""",
    doc="A6: declarative SQL OHLC at 5-min resolution grouped by "
    "(window, instrument_id, product) — reference old/flink.py:56-67 "
    "(TUMBLE → window(); FIRST_VALUE/LAST_VALUE → min_by/max_by).",
)
def a6_sql_ohlc_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    trades_view(spark, sf_dir).createOrReplaceTempView("trades")
    return spark.sql(
        """
        SELECT date_format(window(ts, '5 minutes').start, 'yyyy-MM-dd HH:mm:ss')
                 AS window_start,
               instrument_id,
               product,
               max(price) AS high,
               min(price) AS low,
               min_by(price, ts) AS open,
               max_by(price, ts) AS close
        FROM trades
        GROUP BY window(ts, '5 minutes'), instrument_id, product
        """
    )


@register(
    "a2_running_ohlcv",
    oracle=f"""
WITH {TRADES_ORACLE_CTE}
SELECT seq, product, price,
       first_value(price) OVER w AS open,
       max(price) OVER w AS high,
       min(price) OVER w AS low,
       last_value(price) OVER w AS close,
       CAST(sum(qty) OVER w AS BIGINT) AS volume
FROM trades
WINDOW w AS (PARTITION BY product ORDER BY ts, seq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="A2: cumulative per-event running OHLCV (update-mode emission, "
    "reference 4_ohlc.py:25-59) re-expressed as OVER-window running "
    "aggregates (SURVEY.md §2.7).",
)
def a2_running_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = running_ohlcv(trades_view(spark, sf_dir), seq_col="seq")
    return df.select("seq", "product", "price", "open", "high", "low", "close", "volume")


@register(
    "a3_running_ohlcv_windowed",
    oracle=f"""
WITH {TRADES_ORACLE_CTE}
SELECT seq, product,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       first_value(price) OVER w AS open,
       max(price) OVER w AS high,
       min(price) OVER w AS low,
       last_value(price) OVER w AS close,
       CAST(sum(qty) OVER w AS BIGINT) AS volume
FROM trades
WINDOW w AS (PARTITION BY product, date_trunc('hour', ts) ORDER BY ts, seq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="A3/A5: per-event running OHLCV that resets at each tumbling "
    "bucket (reference 5_ohlc.py:27-112 manual 1-min windows; 1-hour "
    "bucket here for fixture density).",
)
def a3_running_ohlcv_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = running_ohlcv(trades_view(spark, sf_dir), seq_col="seq", window_duration="1 hour")
    return df.select(
        "seq",
        "product",
        F.date_format("window_start", _FMT).alias("window_start"),
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


@register(
    "a5_ohlcv_cascade_1h_to_1d",
    oracle=_candles_oracle("1 day"),
    doc="Multi-resolution cascade (reference old/flink.py:70-79 runs 1-min "
    "and 5-min pipelines): 1-day candles composed from 1-hour candles "
    "instead of rescanning raw events — the 100 TB-friendly plan.",
)
def a5_ohlcv_cascade_1h_to_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = ohlcv(trades_view(spark, sf_dir), "1 hour", seq_col="seq")
    return _strfmt_windows(ohlcv_cascade(hourly, "1 day"))


@register(
    "p1_candles_json_rows",
    oracle=f"""
WITH {TRADES_ORACLE_CTE},
candles AS (
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           product,
           arg_min(price, ts) AS open,
           max(price) AS high,
           min(price) AS low,
           arg_max(price, ts) AS close,
           CAST(sum(qty) AS BIGINT) AS volume
    FROM trades GROUP BY ALL
)
SELECT '{{"window_start":"' || window_start || '","window_end":"' || window_end
       || '","product":"' || product
       || '","open":' || printf('%.2f', open)
       || ',"high":' || printf('%.2f', high)
       || ',"low":' || printf('%.2f', low)
       || ',"close":' || printf('%.2f', close)
       || ',"volume":' || CAST(volume AS VARCHAR) || '}}' AS value
FROM candles
""",
    doc="P1: candle → JSON wire-string projection (reference 3_ohlc.py:69-77 "
    "did this per-row in Python; here a single codegen'd projection).",
)
def p1_candles_json_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    candles = _strfmt_windows(ohlcv(trades_view(spark, sf_dir), "1 hour", seq_col="seq"))
    return candles.select(
        F.format_string(
            '{"window_start":"%s","window_end":"%s","product":"%s",'
            '"open":%.2f,"high":%.2f,"low":%.2f,"close":%.2f,"volume":%d}',
            "window_start",
            "window_end",
            "product",
            "open",
            "high",
            "low",
            "close",
            "volume",
        ).alias("value")
    )


@register(
    "k5_nested_sink_shape",
    oracle=f"""
WITH {TRADES_ORACLE_CTE}
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       product,
       arg_min(price, ts) AS open,
       max(price) AS high,
       min(price) AS low,
       arg_max(price, ts) AS close,
       CAST(sum(qty) AS BIGINT) AS volume
FROM trades
GROUP BY ALL
""",
    doc="K5: Table-API nested sink schema ohlc ROW<open,high,low,close> "
    "(reference old/kfk.py:166-173) — flattened for oracle comparison; "
    "the nested struct shape itself is unit-tested.",
)
def k5_nested_sink_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    candles = ohlcv(trades_view(spark, sf_dir), "1 hour", seq_col="seq")
    nested = nested_sink_shape(candles)
    return nested.select(
        F.date_format("window_start", _FMT).alias("window_start"),
        "product",
        F.col("ohlc.open").alias("open"),
        F.col("ohlc.high").alias("high"),
        F.col("ohlc.low").alias("low"),
        F.col("ohlc.close").alias("close"),
        "volume",
    )


@register(
    "a7_udf_ohlc_window",
    oracle=f"""
WITH {TRADES_ORACLE_CTE}
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       product,
       arg_min(price, ts) AS open,
       max(price) AS high,
       min(price) AS low,
       arg_max(price, ts) AS close,
       CAST(sum(qty) AS BIGINT) AS volume
FROM trades
GROUP BY ALL
""",
    doc="A7/U5: OHLC computed by Python over each window's buffered "
    "rows (reference calculate_ohlc UDF over a collected list, "
    "old/kfk.py:35-50; ProcessAllWindowFunction buffering, "
    "3_ohlc.py:13-25) — via the scalable grouped-UDF pattern: "
    "repartition + sortWithinPartitions + mapInPandas with a "
    "batch-level pandas groupby and cross-batch carry "
    "(operators/candles.ohlcv_python_fold). Per-group applyInPandas "
    "paid function-call overhead per tiny group (11.8s -> ~2s at "
    "sf0.1). The declarative a1 form remains the preferred plan.",
)
def a7_udf_ohlc_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.operators.candles import ohlcv_python_fold

    out = ohlcv_python_fold(trades_view(spark, sf_dir), "1 hour")
    return out.select(
        F.date_format("window_start", _FMT).alias("window_start"),
        "product",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


@register(
    "j6_asof_join_prev_close",
    oracle=f"""
WITH {TRADES_ORACLE_CTE},
candles AS (
    SELECT product,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS cts,
           arg_max(price, ts) AS prev_close
    FROM trades
    GROUP BY product, date_trunc('hour', ts)
)
SELECT t.seq, t.product,
       strftime(t.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       t.price, c.prev_close
FROM trades t
ASOF LEFT JOIN candles c ON t.product = c.product AND t.ts >= c.cts
""",
    doc="As-of (point-in-time) join: each trade annotated with the "
    "latest completed hourly candle's close for its product — the "
    "canonical time-series operator of the reference's domain, built "
    "as union + ordered-window composition (one linear shuffle, no "
    "interval explosion; operators/asof.py). DuckDB's native ASOF JOIN "
    "is the oracle.",
)
def j6_asof_join_prev_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.operators.asof import asof_join

    trades = trades_view(spark, sf_dir)
    candles = ohlcv(trades, "1 hour", seq_col="seq").select(
        "product",
        F.col("window_end").alias("ts"),
        F.col("close").alias("prev_close"),
    )
    out = asof_join(trades, candles, key_col="product")
    return out.select(
        "seq",
        "product",
        F.date_format("ts", _FMT + ".SSSSSS").alias("ts"),
        "price",
        "prev_close",
    )


@register(
    "a8_flink_tumble_sql",
    oracle=f"""
WITH {TRADES_ORACLE_CTE}
SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       instrument_id,
       product,
       max(price) AS high,
       min(price) AS low,
       arg_min(price, ts) AS open,
       arg_max(price, ts) AS close
FROM trades
GROUP BY ALL
""",
    doc="The reference's Flink SQL TUMBLE query VERBATIM "
    "(old/flink.py:42-53), run through the dialect translator "
    "(functions/tumble.expand_tumble_sql): TUMBLE -> window(), "
    "TUMBLE_START -> window().start, FIRST_VALUE/LAST_VALUE -> "
    "rowtime-keyed min_by/max_by (deterministic upgrade of the "
    "reference's arrival-order dependence). A user's existing TUMBLE "
    "SQL runs unchanged.",
)
def a8_flink_tumble_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.functions.tumble import expand_tumble_sql

    trades_view(spark, sf_dir).createOrReplaceTempView("trades")
    # The reference query text (old/flink.py:42-53), formatting kept.
    flink_sql = """
        SELECT
            TUMBLE_START(ts, INTERVAL '1' MINUTE) AS window_start,
            instrument_id,
            product,
            MAX(price) AS high,
            MIN(price) AS low,
            FIRST_VALUE(price) AS open,
            LAST_VALUE(price) AS close
        FROM Trades
        GROUP BY
            TUMBLE(ts, INTERVAL '1' MINUTE),
            instrument_id,
            product
    """
    out = spark.sql(expand_tumble_sql(flink_sql))
    return out.withColumn(
        "window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
    )


@register(
    "j7_asof_join_tolerance",
    oracle=f"""
WITH {TRADES_ORACLE_CTE},
candles AS (
    SELECT product,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS cts,
           arg_max(price, ts) AS prev_close
    FROM trades
    GROUP BY product, date_trunc('hour', ts)
)
SELECT t.seq, t.product,
       strftime(t.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       t.price,
       CASE WHEN c.cts >= t.ts - INTERVAL 4 HOUR THEN c.prev_close END AS prev_close
FROM trades t
ASOF LEFT JOIN candles c ON t.product = c.product AND t.ts >= c.cts
""",
    doc="As-of join with a staleness tolerance (pandas merge_asof "
    "tolerance semantics): the latest completed hourly close is "
    "attached only if it closed within the last 4 hours; older matches "
    "yield NULL — the point-in-time-correctness guard for feature "
    "pipelines (a quote from last week must not leak into today's "
    "row). Same union + ordered-window plan as j6, one linear "
    "shuffle; the bound is a post-fill conditional, not another join.",
)
def j7_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.operators.asof import asof_join

    trades = trades_view(spark, sf_dir)
    candles = ohlcv(trades, "1 hour", seq_col="seq").select(
        "product",
        F.col("window_end").alias("ts"),
        F.col("close").alias("prev_close"),
    )
    out = asof_join(trades, candles, key_col="product", tolerance="4 hours")
    return out.select(
        "seq",
        "product",
        F.date_format("ts", _FMT + ".SSSSSS").alias("ts"),
        "price",
        "prev_close",
    )


@register(
    "j9_asof_join_forward",
    oracle=f"""
WITH {TRADES_ORACLE_CTE},
candles AS (
    SELECT product,
           date_trunc('hour', ts) AS cts,
           arg_max(price, ts) AS hour_close
    FROM trades
    GROUP BY date_trunc('hour', ts), product
)
SELECT t.seq, t.product,
       strftime(t.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       t.price, c.hour_close
FROM trades t
ASOF LEFT JOIN candles c ON t.product = c.product AND t.ts <= c.cts
""",
    doc="FORWARD as-of join (pandas merge_asof direction='forward'): "
    "each trade annotated with the close of the next hourly candle "
    "whose window START is at-or-after the trade — the look-ahead "
    "labeling primitive of supervised market-data pipelines. Same "
    "union + ordered-window composition as j6 traversed in descending "
    "time (operators/asof.py); DuckDB ASOF with the inequality "
    "flipped is the oracle.",
)
def j9_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.operators.asof import asof_join

    trades = trades_view(spark, sf_dir)
    candles = ohlcv(trades, "1 hour", seq_col="seq").select(
        "product",
        F.col("window_start").alias("ts"),
        F.col("close").alias("hour_close"),
    )
    out = asof_join(trades, candles, key_col="product", direction="forward")
    return out.select(
        "seq",
        "product",
        F.date_format("ts", _FMT + ".SSSSSS").alias("ts"),
        "price",
        "hour_close",
    )
