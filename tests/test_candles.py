"""Unit semantics for the OHLCV operators on a hand-built frame —
open/close determinism (incl. ts ties broken by seq), cascade
equivalence, nested sink shape (FIXTURES.md §A3/A4 expected-value
rule)."""

from __future__ import annotations

from datetime import datetime

from kafka_flink_spark.operators.candles import (
    nested_sink_shape,
    ohlcv,
    ohlcv_cascade,
    running_ohlcv,
    to_json_rows,
)
from pyspark.sql import types as T

from kafka_flink_spark.schemas import TRADE_SCHEMA


def _trades_with_seq(spark):
    rows = [
        # (ts, instrument_id, product, price, qty, seq) — minute 0
        (datetime(2024, 1, 1, 0, 0, 5), "I1", "A", 10.0, 1, 1),
        (datetime(2024, 1, 1, 0, 0, 10), "I1", "A", 15.0, 2, 2),
        (datetime(2024, 1, 1, 0, 0, 50), "I1", "A", 12.0, 3, 3),
        # minute 1
        (datetime(2024, 1, 1, 0, 1, 1), "I1", "A", 20.0, 4, 4),
        (datetime(2024, 1, 1, 0, 1, 2), "I1", "A", 5.0, 5, 5),
        # other product, same minute — tied timestamps, seq breaks them
        (datetime(2024, 1, 1, 0, 0, 30), "I2", "B", 100.0, 10, 6),
        (datetime(2024, 1, 1, 0, 0, 30), "I2", "B", 200.0, 10, 7),
    ]
    schema = T.StructType(TRADE_SCHEMA.fields + [T.StructField("seq", T.LongType())])
    return spark.createDataFrame(rows, schema)


def test_ohlcv_basic(spark):
    out = ohlcv(_trades_with_seq(spark), "1 minute", seq_col="seq")
    rows = {(r.product, r.window_start.minute): r for r in out.collect()}
    a0 = rows[("A", 0)]
    assert (a0.open, a0.high, a0.low, a0.close, a0.volume) == (10.0, 15.0, 10.0, 12.0, 6)
    a1 = rows[("A", 1)]
    assert (a1.open, a1.close, a1.volume) == (20.0, 5.0, 9)
    b0 = rows[("B", 0)]
    # tied ts: seq 6 is open, seq 7 is close
    assert (b0.open, b0.close, b0.high, b0.low) == (100.0, 200.0, 200.0, 100.0)


def test_ohlcv_window_bounds(spark):
    out = ohlcv(_trades_with_seq(spark), "1 minute", seq_col="seq").collect()
    for r in out:
        assert (r.window_end - r.window_start).total_seconds() == 60.0


def test_cascade_equals_direct(spark):
    df = _trades_with_seq(spark)
    fine = ohlcv(df, "1 minute", seq_col="seq")
    cascaded = ohlcv_cascade(fine, "5 minutes")
    direct = ohlcv(df, "5 minutes", seq_col="seq")
    key = lambda r: (r.product, r.window_start)
    c = {key(r): (r.open, r.high, r.low, r.close, r.volume) for r in cascaded.collect()}
    d = {key(r): (r.open, r.high, r.low, r.close, r.volume) for r in direct.collect()}
    assert c == d


def test_running_ohlcv_cumulative(spark):
    out = running_ohlcv(_trades_with_seq(spark), seq_col="seq")
    a = sorted(
        (r for r in out.collect() if r.product == "A"), key=lambda r: r.seq
    )
    assert [r.open for r in a] == [10.0] * 5  # open sticks to first event
    assert [r.close for r in a] == [10.0, 15.0, 12.0, 20.0, 5.0]  # close tracks
    assert [r.volume for r in a] == [1, 3, 6, 10, 15]  # running sum of qty
    assert [r.high for r in a] == [10.0, 15.0, 15.0, 20.0, 20.0]


def test_running_ohlcv_resets_per_window(spark):
    out = running_ohlcv(_trades_with_seq(spark), seq_col="seq", window_duration="1 minute")
    a = sorted((r for r in out.collect() if r.product == "A"), key=lambda r: r.seq)
    assert [r.open for r in a] == [10.0, 10.0, 10.0, 20.0, 20.0]  # resets at minute 1
    assert [r.volume for r in a] == [1, 3, 6, 4, 9]


def test_nested_sink_shape(spark):
    candles = ohlcv(_trades_with_seq(spark), "1 minute", seq_col="seq")
    nested = nested_sink_shape(candles)
    assert [f.name for f in nested.schema.fields] == [
        "window_start",
        "product",
        "ohlc",
        "volume",
    ]
    assert [f.name for f in nested.schema["ohlc"].dataType.fields] == [
        "open",
        "high",
        "low",
        "close",
    ]


def test_json_rows_shape(spark):
    candles = ohlcv(_trades_with_seq(spark), "1 minute", seq_col="seq")
    row = to_json_rows(candles).orderBy("value").first()
    assert row.value.startswith('{"window_start":"2024-01-01 00:0')
    assert '"open":' in row.value and '"volume":' in row.value


def test_asof_join_semantics(spark):
    """asof.asof_join: latest right row at-or-before each left ts per
    key; strict mode excludes same-instant matches."""
    from pyspark.sql import functions as F

    from kafka_flink_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("A", 10, 1), ("A", 20, 2), ("A", 5, 3), ("B", 10, 4)],
        "k string, t long, seq long",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "seq")
    right = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 15, 150.0), ("B", 99, 999.0)],
        "k string, t long, px double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "px")

    out = {r["seq"]: r["px"] for r in asof_join(left, right, "k").collect()}
    assert out[1] == 100.0  # same-instant match included
    assert out[2] == 150.0  # latest at-or-before 20
    assert out[3] is None   # nothing before t=5
    assert out[4] is None   # B's only right row is later

    strict = {r["seq"]: r["px"] for r in asof_join(left, right, "k", strict=True).collect()}
    assert strict[1] is None  # same-instant excluded
    assert strict[2] == 150.0


def test_asof_join_nullable_payload_matched_row_semantics(spark):
    """merge_asof semantics for nullable payloads: the MATCHED row's
    value is carried even when null — a null in the latest right row
    must not be back-filled from an older (possibly tolerance-stale)
    right row."""
    from pyspark.sql import functions as F

    from kafka_flink_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("A", 100, 1)], "k string, t long, seq long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "seq")
    right = spark.createDataFrame(
        [("A", 10, 5.0, 50.0), ("A", 99, None, 99.0)],
        "k string, t long, px double, qty double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "px", "qty")

    # latest right row (t=99) matches; its px is null and must stay null
    # (the old per-column fill leaked px=5.0 from the t=10 row)
    row = asof_join(left, right, "k").collect()[0]
    assert row["px"] is None and row["qty"] == 99.0

    # with a 10s tolerance the t=10 row is stale: same result, and the
    # freshness gate must judge the matched row (t=99), not the t=10 one
    row = asof_join(left, right, "k", tolerance="10 seconds").collect()[0]
    assert row["px"] is None and row["qty"] == 99.0


def test_expand_tumble_sql_rewrites():
    """Dialect translation: TUMBLE family + FIRST/LAST_VALUE rewrite."""
    from kafka_flink_spark.functions.tumble import expand_tumble_sql

    sql = (
        "SELECT TUMBLE_START(rowtime, INTERVAL '5' MINUTE) AS ws, "
        "TUMBLE_END(rowtime, INTERVAL '5' MINUTE) AS we, "
        "FIRST_VALUE(price) AS open, LAST_VALUE(price) AS close "
        "FROM t GROUP BY TUMBLE(rowtime, INTERVAL '5' MINUTE)"
    )
    out = expand_tumble_sql(sql)
    assert "window(rowtime, '5 minutes').start AS ws" in out
    assert "window(rowtime, '5 minutes').end AS we" in out
    assert "min_by(price, rowtime) AS open" in out
    assert "max_by(price, rowtime) AS close" in out
    assert "GROUP BY window(rowtime, '5 minutes')" in out
    assert "TUMBLE" not in out

    hourly = expand_tumble_sql(
        "SELECT TUMBLE(ts, INTERVAL '2' HOUR) FROM t", rowtime="ts"
    )
    assert "window(ts, '2 hours')" in hourly
