"""Canonical row schemas for the engine.

Schemas are fixed and explicitly declared, mirroring the reference's
stance (schemas declared inline at source construction; see reference
``3_ohlc.py:28``, ``old/kfk.py:94-107``), but standardized per
SURVEY.md §1.5: ``price`` is DOUBLE (the SQL-variant type,
``old/flink.py:30``), ``qty`` is LONG, and epoch-millis timestamps are
converted to TIMESTAMP at ingest.
"""

from __future__ import annotations

from pyspark.sql import types as T

# A1 — canonical 5-field trade event (reference 3_ohlc.py:28). The
# wire form carries `timestamp` as epoch millis; the engine-native
# form converts it to a TIMESTAMP column named `ts` at ingest.
TRADE_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),  # epoch ms
        T.StructField("instrument_id", T.StringType()),
        T.StructField("product", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.LongType()),
    ]
)

TRADE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("instrument_id", T.StringType()),
        T.StructField("product", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.LongType()),
    ]
)

# A2 — rich 13-field trade event (reference old/kfk.py:94-107,
# generator old/generate.py:19-33).
TRADE_RICH_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("Timestamp", T.LongType()),  # epoch ms
        T.StructField("InstrumentId", T.StringType()),
        T.StructField("Product", T.StringType()),
        T.StructField("Price", T.DoubleType()),
        T.StructField("Qty", T.IntegerType()),
        T.StructField("Direction", T.StringType()),
        T.StructField("DirectAskCounterparty", T.StringType()),
        T.StructField("DirectBidCounterparty", T.StringType()),
        T.StructField("IsImplied", T.BooleanType()),
        T.StructField("IsLegTrade", T.BooleanType()),
        T.StructField("IsOtc", T.BooleanType()),
        T.StructField("OTCTradeType", T.StringType()),
        T.StructField("Id", T.StringType()),
    ]
)

# A3 — OHLCV candle output (reference 3_ohlc.py:69-77 + product column
# from 6_ohlc.py:105-114).
OHLCV_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("window_end", T.TimestampType()),
        T.StructField("product", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ]
)

# Nested sink form: ohlc ROW<open,high,low,close> (old/kfk.py:166-173).
OHLC_NESTED_SINK_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("product", T.StringType()),
        T.StructField(
            "ohlc",
            T.StructType(
                [
                    T.StructField("open", T.DoubleType()),
                    T.StructField("high", T.DoubleType()),
                    T.StructField("low", T.DoubleType()),
                    T.StructField("close", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("volume", T.LongType()),
    ]
)

# A4 — toy 2-field row for Kafka JSON round-trip / topic-transfer tests
# (reference 0_kafka_json_flink.py:30, 1_transfer.py:9).
TOY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("msg", T.StringType()),
    ]
)

# Driver fixture tables (FIXTURES.md §B).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
