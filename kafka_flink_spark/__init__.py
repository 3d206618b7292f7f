"""kafka_flink_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference project ``pnikhil610/kafka-flink``:
Kafka JSON trade/event streams with declared row schemas, event-time
processing with watermarks and tumbling/sliding/session windows, keyed
stateful aggregation headlined by OHLCV candlesticks, per-event
"update"-mode and end-of-window "append"-mode emission, topic transfer,
SQL window queries, and scalar/stateful UDF surfaces — re-expressed
Spark-first (DataFrame / Spark SQL / Catalyst / Structured Streaming),
and extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Package map
-----------
- :mod:`kafka_flink_spark.session`   — SparkSession factory.
- :mod:`kafka_flink_spark.schemas`   — canonical row schemas.
- :mod:`kafka_flink_spark.sources`   — batch/stream sources (parquet fixtures,
  Kafka, rate/memory) and sinks (Kafka, console, JDBC-via-foreachBatch).
- :mod:`kafka_flink_spark.operators` — relational + domain operators
  (candles, dedup, similarity, text analysis, multimodal plumbing).
- :mod:`kafka_flink_spark.functions` — scalar helpers (time, JSON, hashing).
- :mod:`kafka_flink_spark.streaming` — Structured Streaming pipelines
  (windowed candles, update/append dual emit, stateful processing,
  topic transfer).
- :mod:`kafka_flink_spark.plans`     — plan-inspection utilities
  (pushdown / broadcast / codegen assertions for the perf gate).
"""

__version__ = "0.1.0"
