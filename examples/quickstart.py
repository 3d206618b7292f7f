"""Quickstart: the reference's pipelines, re-expressed on this engine.

Runnable without Kafka (file-replay source stands in; swap in
``sources/kafka_io.kafka_json_source`` for a real broker — the
downstream pipeline objects are identical):

    python examples/quickstart.py

Covers the reference's whole user surface:
1. batch OHLCV candles at two resolutions (``old/flink.py:42-67``),
2. the verbatim Flink TUMBLE SQL via the dialect translator,
3. streaming candles with update + append emission (``5_ohlc.py``,
   ``7_ohlc.py``),
4. the JSON wire shape on the way out (``3_ohlc.py:69-77``).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_spark.functions.tumble import expand_tumble_sql  # noqa: E402
from kafka_flink_spark.operators.candles import (  # noqa: E402
    ohlcv,
    ohlcv_cascade,
    to_json_rows,
)
from kafka_flink_spark.session import get_session  # noqa: E402
from kafka_flink_spark.sources.fixtures import trades_view  # noqa: E402
from kafka_flink_spark.streaming.candles_stream import (  # noqa: E402
    ohlcv_stream,
    run_available_now,
    stream_trades_from_fixture,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session("quickstart")

    # 1. Batch candles: 1-minute, then cascaded to 5-minute — the
    #    reference's two SQL jobs, one scan.
    trades = trades_view(spark, SF_DIR)
    m1 = ohlcv(trades, "1 minute", seq_col="seq")
    m5 = ohlcv_cascade(m1, "5 minutes")
    print("--- 1-minute candles")
    m1.orderBy("window_start", "product").show(5, truncate=False)
    print("--- 5-minute candles (cascaded from 1-minute)")
    m5.orderBy("window_start", "product").show(5, truncate=False)

    # 2. The reference's Flink SQL, unchanged, through the translator.
    trades.createOrReplaceTempView("Trades")
    flink_sql = """
        SELECT TUMBLE_START(ts, INTERVAL '1' MINUTE) AS window_start,
               product, MAX(price) AS high, MIN(price) AS low,
               FIRST_VALUE(price) AS open, LAST_VALUE(price) AS close
        FROM Trades
        GROUP BY TUMBLE(ts, INTERVAL '1' MINUTE), product
    """
    print("--- verbatim TUMBLE SQL via expand_tumble_sql")
    spark.sql(expand_tumble_sql(flink_sql)).show(5, truncate=False)

    # 3. Streaming: same aggregation, update-mode running candles and
    #    append-mode end-of-window finals (the reference's dual emit).
    stream = stream_trades_from_fixture(spark, SF_DIR)
    candles = ohlcv_stream(stream, "1 hour")
    updates = run_available_now(candles, "update")
    print(f"--- streaming update-mode rows: {updates.count()}")

    # 4. JSON wire shape out (→ .writeStream.format('kafka') in prod).
    print("--- JSON wire rows")
    to_json_rows(m1.limit(3)).show(3, truncate=False)

    # 5. Load generation without Kafka: the reference's producer loop
    #    as a first-class partition-parallel DataSource (Spark 4 API).
    from kafka_flink_spark.sources.trade_gen import register_trade_gen

    register_trade_gen(spark)
    gen = spark.read.format("trade_gen").option("rows", "5000").load()
    print(f"--- trade_gen datasource rows: {gen.count()}")

    # 6. Training-data hygiene: PII redaction + semantic dedup.
    from kafka_flink_spark.operators.similarity import semantic_dedup_pairs
    from kafka_flink_spark.operators.text import redact_pii
    from kafka_flink_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_DIR, "documents")
    red = redact_pii(docs.select("doc_id", "text"))
    print(f"--- docs scanned for PII: {red.count()}")
    emb = load_table(spark, SF_DIR, "embeddings")
    sem = semantic_dedup_pairs(emb, min_cosine=0.35)
    print(f"--- semantic near-dup pairs (within-cluster): {sem.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
