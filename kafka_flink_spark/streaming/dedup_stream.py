"""Streaming deduplication — the unbounded-input form of the dedup
family (operators/dedup.py covers batch corpora).

Two built-in strategies, both state-store-backed:

* ``dedup_stream`` — exact key dedup over the whole stream
  (``dropDuplicates``): state grows with distinct keys; right when the
  key space is bounded (e.g. event ids within a replayable topic).
* ``dedup_stream_within_watermark`` — exact key dedup where duplicates
  are only expected within the out-of-orderness budget
  (``dropDuplicatesWithinWatermark``): state is watermark-evicted, so
  it's bounded by (arrival rate × watermark delay) — the 100 TB-safe
  default for at-least-once sources like Kafka, whose duplicates are
  retries within seconds of each other, not days.

The reference has no dedup (its Kafka consumers are at-least-once and
it tolerates duplicates silently); these operators close that gap for
the training-data-pipeline surface (exact dedup over a document stream
= d1_exact_dedup streaming form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """First occurrence per key wins, forever (unbounded state)."""
    return stream.dropDuplicates(key_cols)


def dedup_stream_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key wins among events whose event times fall
    within the watermark budget of each other; state for keys older
    than the watermark is evicted. Requires the duplicate-producing
    mechanism (producer retries, reprocessing) to stay inside the
    delay — true for Kafka-style at-least-once delivery."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(key_cols)
