"""Event-time scalar helpers.

The reference does all of this row-at-a-time in Python
(``datetime.fromtimestamp(ts/1000)`` — ``5_ohlc.py:71``;
``strftime`` — ``3_ohlc.py:70``; minute truncation — ``5_ohlc.py:72``;
N-minute grid alignment — ``7_ohlc.py:64``). Every helper here is a
native Column expression: JVM-side, codegen'd, no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(col: Column | str) -> Column:
    """Epoch-millis LONG → TIMESTAMP (reference ``5_ohlc.py:71``)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def ts_to_epoch_ms(col: Column | str) -> Column:
    """TIMESTAMP → epoch-millis LONG (reference emits epoch ms on the
    wire, ``3_ohlc.py:69-77``)."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def format_ts(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """strftime('%Y-%m-%d %H:%M:%S') equivalent (``3_ohlc.py:70``)."""
    return F.date_format(col, fmt)


def truncate_to_minute(col: Column | str) -> Column:
    """``replace(second=0, microsecond=0)`` equivalent (``5_ohlc.py:72``)."""
    return F.date_trunc("minute", col)


def align_to_grid(col: Column | str, minutes: int) -> Column:
    """Align a timestamp down to an N-minute grid — the reference's
    ``(minute // d) * d`` bucketing (``7_ohlc.py:64``). Identical to
    ``window(col, f"{minutes} minutes").start`` for epoch-aligned
    grids; exposed standalone for projections."""
    c = F.col(col) if isinstance(col, str) else col
    secs = minutes * 60
    return F.timestamp_seconds((F.unix_timestamp(c) / secs).cast("long") * secs)
