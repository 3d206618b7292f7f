"""Running candles on ``transformWithStateInPandas`` (Spark ≥ 4.0) —
the modern arbitrary-stateful API with first-class timers.

This is the faithful Spark re-expression of the reference's
``KeyedProcessFunction`` + ``on_timer`` design (``6_ohlc.py:35-103``,
``7_ohlc.py:35-98``) that its drafts never got working:

* typed ValueState per key (vs ``PICKLED_BYTE_ARRAY`` blobs);
* **event-time timers**: each key registers a timer at its current
  window's end; when the watermark passes it, ``handleExpiredTimer``
  emits the ``end_of_window`` final and clears state — so finals flow
  even if the key never receives another event (the exact gap in the
  reference's window-transition-only emission, SURVEY.md §2.9 W9/W12).

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``RocksDBStateStoreProvider``) and the ``protobuf`` Python package
(PySpark's transformWithState worker protocol imports
``google.protobuf``; environments without it get an import-time
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE``). Use
``tws_available()`` to probe. The applyInPandasWithState variant in
streaming/stateful.py has no such dependency and remains the default
path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

from kafka_flink_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    _emit,
    _fold_events,
)

if TYPE_CHECKING:
    import pandas as pd

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the runtime can execute transformWithStateInPandas
    (its worker protocol needs google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_candles_tws(trades: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Per-event running candles + timer-driven end-of-window finals.

    Event-time mode: watermark advances with the input's ``ts`` column
    (``withWatermark`` upstream); a timer at window_end fires once the
    watermark passes it."""
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    window_us = window_minutes * 60 * 1_000_000

    class RunningCandles(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("candle", STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator["pd.DataFrame"], timerValues: TimerValues
        ) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            st = None
            if self.state.exists():
                o, h, lo, c, v, ws = self.state.get()
                st = {
                    "open": o,
                    "high": h,
                    "low": lo,
                    "close": c,
                    "volume": v,
                    "window_start_us": ws,
                }
            out: list[tuple] = []
            for pdf in rows:
                folded, st = _fold_events(pdf, st, window_minutes)
                out.extend(folded)
            if st is not None:
                self.state.update(
                    (
                        st["open"],
                        st["high"],
                        st["low"],
                        st["close"],
                        st["volume"],
                        st["window_start_us"],
                    )
                )
                # Arm/refresh the end-of-window timer (epoch ms).
                self.handle.registerTimer((st["window_start_us"] + window_us) // 1_000)
            yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            if not self.state.exists():
                return
            o, h, lo, c, v, ws = self.state.get()
            expiry_ms = expiredTimerInfo.getExpiryTimeInMs()
            if (ws + window_us) // 1_000 > expiry_ms:
                # A newer window re-armed the timer; this one is stale.
                return
            st = {"open": o, "high": h, "low": lo, "close": c, "volume": v,
                  "window_start_us": ws}
            self.state.clear()
            yield pd.DataFrame(
                [_emit(key[0], None, st, end_of_window=True)],
                columns=[f.name for f in OUTPUT_SCHEMA.fields],
            )

        def close(self) -> None:
            pass

    return trades.groupBy("product").transformWithStateInPandas(
        statefulProcessor=RunningCandles(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )
