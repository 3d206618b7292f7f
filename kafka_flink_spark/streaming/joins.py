"""Stream-stream joins (absent in the reference — its domain's obvious
next operator: trades × quotes, orders × fills).

Structured Streaming buffers both sides in watermark-bounded state and
emits matches as they arrive. The time-interval condition is mandatory
for state to be evictable: without it, both sides buffer forever.

Scale: state per side ≈ (arrival rate × interval width + watermark
delay); the join shuffles both streams on the key — same exchange
shape as the batch join, just incremental.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark_delay: str = "0 seconds",
    how: str = "inner",
    extra_condition: Column | None = None,
) -> DataFrame:
    """Join events whose times satisfy
    ``left_ts - lower <= right_ts <= left_ts + upper``
    with equal ``key_col`` (e.g. lower='10 minutes', upper='0 seconds'
    = "right happened within the 10 minutes before left").
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (lw[key_col] == rw[key_col])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return lw.join(rw, cond, how)
