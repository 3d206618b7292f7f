"""Scalar function helpers (SURVEY.md §2.10)."""

from kafka_flink_spark.functions.timeutil import (
    align_to_grid,
    epoch_ms_to_ts,
    format_ts,
    truncate_to_minute,
    ts_to_epoch_ms,
)

__all__ = [
    "align_to_grid",
    "epoch_ms_to_ts",
    "format_ts",
    "truncate_to_minute",
    "ts_to_epoch_ms",
]
