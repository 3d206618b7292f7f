"""Flink-style ALLOWED LATENESS as a knob separate from the watermark.

The reference configures two independent timings on its window
(``3_ohlc.py:63``): a bounded-out-of-orderness watermark (how long to
wait before first firing a window) and ``allowed_lateness`` (how long
a *fired* window stays alive to re-fire on late stragglers before its
state is purged and later events go to a side output). Spark's single
``withWatermark`` delay folds the two together — the engine never
re-fires a window it has evicted — which SURVEY.md §7.4.2 documents
as the defined equivalence.

This module un-folds them on the ``applyInPandasWithState`` path:

* Spark's own watermark delay is set to ``out_of_orderness +
  allowed_lateness + window`` so the engine's pre-filter is strictly
  MORE permissive than Flink's drop rule; the exact Flink clock
  (``flink_wm = spark_wm + allowed_lateness + window``, both derived
  from the same global max event time) is reconstructed inside the
  state function from ``state.getCurrentWatermarkMs()``.
* A window first FIRES (``kind='on_time'``) when the Flink watermark
  passes its end — driven by event-time timers
  (``setTimeoutTimestamp``) for idle keys and checked inline for keys
  receiving data, exactly Flink's ``EventTimeTrigger``.
* A late event for an already-fired window within the lateness budget
  is folded and the window RE-FIRES (``kind='late_update'``) — the
  per-event re-fire collapsed to per-micro-batch granularity, the
  same defined equivalence as W11.
* An event whose window end + lateness ≤ the Flink watermark is
  DROPPED; the side output the reference routes such events to
  (Flink's ``sideOutputLateData``) is emitted as per-window
  ``kind='dropped'`` aggregate rows.
* A fired window is PURGED (state removed, silently) when the Flink
  watermark passes end + lateness, so state per key is bounded by
  ``(lateness + window) / window`` open windows under a continuously
  advancing watermark — independent of input volume, the 100 TB
  shape. (Under a replay whose first batch precedes any watermark,
  state transiently holds that batch's full window set, like any
  cold-start backfill.)

Determinism contract: (product, ts) is unique in the fixture (the
w30 discipline), so ts-ordered folds and ``arg_min/arg_max(price,
ts)`` oracles agree exactly; all arithmetic is selection/max/min and
integer sums — no float accumulation.

Boundary note: before the first batch completes Spark reports the
watermark as epoch 0, which this module maps to a Flink clock of
epoch + lateness + window (Flink's startup watermark is -inf). Any
window ending before that instant — i.e. event times in the first
hours of 1970 — would fire prematurely; real event-time data is
assumed to postdate it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# One open window per array slot: parallel arrays keyed by window
# start (epoch µs). open/close carry their defining event time so
# late events that precede the current open (or follow the current
# close) update them correctly — the incremental form of
# arg_min/arg_max(price, ts).
LATENESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ws_us", T.ArrayType(T.LongType())),
        T.StructField("open", T.ArrayType(T.DoubleType())),
        T.StructField("open_ts_us", T.ArrayType(T.LongType())),
        T.StructField("high", T.ArrayType(T.DoubleType())),
        T.StructField("low", T.ArrayType(T.DoubleType())),
        T.StructField("close", T.ArrayType(T.DoubleType())),
        T.StructField("close_ts_us", T.ArrayType(T.LongType())),
        T.StructField("volume", T.ArrayType(T.LongType())),
        T.StructField("n", T.ArrayType(T.LongType())),
        T.StructField("fired", T.ArrayType(T.BooleanType())),
    ]
)

LATENESS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("product", T.StringType()),
        T.StructField("window_start", T.TimestampType()),
        T.StructField("kind", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_FIELDS = (
    "open open_ts_us high low close close_ts_us volume n fired".split()
)


def _merge_rec(rec: dict[str, Any], part: dict[str, Any]) -> None:
    """Merge a partial window aggregate into a running one — the
    incremental (associative, commutative) form of
    ``arg_min/arg_max(price, ts)`` + max/min/sum, so fold order never
    matters and per-batch contributions can be pre-aggregated
    vectorized."""
    if rec["n"] == 0:
        rec.update(part)
        return
    if part["open_ts_us"] < rec["open_ts_us"]:
        rec["open"], rec["open_ts_us"] = part["open"], part["open_ts_us"]
    if part["close_ts_us"] > rec["close_ts_us"]:
        rec["close"], rec["close_ts_us"] = part["close"], part["close_ts_us"]
    rec["high"] = max(rec["high"], part["high"])
    rec["low"] = min(rec["low"], part["low"])
    rec["volume"] += part["volume"]
    rec["n"] += part["n"]


def _emit(product: str, ws_us: int, kind: str, rec: dict[str, Any]) -> tuple:
    import datetime

    ws = datetime.datetime.fromtimestamp(
        ws_us / 1_000_000, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (
        product, ws, kind,
        rec["open"], rec["high"], rec["low"], rec["close"],
        rec["volume"], rec["n"],
    )


def allowed_lateness_candles(
    trades: DataFrame,
    window_minutes: int = 60,
    lateness_minutes: int = 30,
    out_of_orderness_seconds: int = 0,
) -> DataFrame:
    """Tumbling OHLCV with Flink two-knob lateness semantics.

    Input columns: ts TIMESTAMP, product STRING, price DOUBLE,
    qty LONG (seq accepted and ignored — (product, ts) must be
    unique). Output: one ``on_time`` row per non-empty window at
    first firing, ``late_update`` re-fires for late-but-in-budget
    stragglers, ``dropped`` side-output aggregates beyond the budget.

    REQUIRES ``spark.sql.session.timeZone=UTC`` (asserted at build
    time): the pandas wall-time micros inside the state function are
    compared against ``getCurrentWatermarkMs()`` — a UTC instant —
    and ``_emit`` round-trips window starts through naive UTC
    datetimes, so any other session timezone would silently shift
    every window boundary and the reconstructed Flink clock by the
    offset. ``session.get_spark`` pins UTC; external callers get a
    loud error instead of shifted windows.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tz = trades.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            "allowed_lateness_candles requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): watermark-vs-wall-time comparisons and naive-UTC "
            "window reconstruction shift by the zone offset otherwise"
        )

    win_ms = window_minutes * 60_000
    late_ms = lateness_minutes * 60_000
    ooo_ms = out_of_orderness_seconds * 1_000
    # flink_wm = spark_wm + flink_off (see module docstring)
    flink_off_ms = late_ms + win_ms
    delay_s = (ooo_ms + flink_off_ms) // 1_000
    win_us = win_ms * 1_000

    cols = [f.name for f in LATENESS_OUTPUT_SCHEMA.fields]

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        product = key[0]
        flink_wm_ms = state.getCurrentWatermarkMs() + flink_off_ms

        windows: dict[int, dict[str, Any]] = {}
        if state.exists:
            row = state.get
            for i, ws in enumerate(row[0]):
                windows[ws] = {
                    f: row[j + 1][i] for j, f in enumerate(_FIELDS)
                }

        out: list[tuple] = []

        def advance() -> None:
            # Fire every unfired window the Flink watermark has
            # passed; purge fired windows past their lateness budget.
            for ws in sorted(windows):
                rec = windows[ws]
                end_ms = (ws + win_us) // 1_000
                if not rec["fired"] and end_ms <= flink_wm_ms:
                    out.append(_emit(product, ws, "on_time", rec))
                    rec["fired"] = True
                if rec["fired"] and end_ms + late_ms <= flink_wm_ms:
                    del windows[ws]

        advance()  # state as of the previous batch: on-time firings
                   # precede this batch's (late) arrivals

        refire: set[int] = set()
        dropped: dict[int, dict[str, Any]] = {}
        if not state.hasTimedOut:
            # Vectorized pre-aggregation: one pandas groupby reduces
            # the batch to per-window partials, so interpreted Python
            # runs per WINDOW, not per event — the Arrow-batch shape
            # that keeps this path viable at volume.
            frames = [p for p in pdfs if len(p)]
            for pdf in frames:
                ts_us = pdf["ts"].to_numpy().astype("int64") // 1_000
                gdf = pd.DataFrame(
                    {
                        "ws": (ts_us // win_us) * win_us,
                        "ts": ts_us,
                        "p": pdf["price"].to_numpy(),
                        "q": pdf["qty"].to_numpy(),
                    }
                )
                g = gdf.groupby("ws", sort=True)
                agg = g.agg(
                    high=("p", "max"),
                    low=("p", "min"),
                    volume=("q", "sum"),
                    n=("p", "size"),
                    open_ts_us=("ts", "min"),
                    close_ts_us=("ts", "max"),
                )
                agg["open"] = gdf["p"].to_numpy()[g["ts"].idxmin().to_numpy()]
                agg["close"] = gdf["p"].to_numpy()[g["ts"].idxmax().to_numpy()]
                for ws, arow in agg.iterrows():
                    part = {
                        "open": float(arow["open"]),
                        "open_ts_us": int(arow["open_ts_us"]),
                        "high": float(arow["high"]),
                        "low": float(arow["low"]),
                        "close": float(arow["close"]),
                        "close_ts_us": int(arow["close_ts_us"]),
                        "volume": int(arow["volume"]),
                        "n": int(arow["n"]),
                    }
                    ws = int(ws)
                    end_ms = (ws + win_us) // 1_000
                    if end_ms + late_ms <= flink_wm_ms:
                        rec = dropped.setdefault(ws, {"n": 0})
                        _merge_rec(rec, part)
                        continue
                    rec = windows.get(ws)
                    if rec is None:
                        rec = windows[ws] = {"n": 0, "fired": False}
                    elif rec["fired"]:
                        refire.add(ws)
                    _merge_rec(rec, part)

        advance()  # windows completed by this batch's own data
        for ws in sorted(refire):
            if ws in windows:
                out.append(_emit(product, ws, "late_update", windows[ws]))
        for ws in sorted(dropped):
            out.append(_emit(product, ws, "dropped", dropped[ws]))

        if windows:
            order = sorted(windows)
            state.update(
                tuple(
                    [order]
                    + [[windows[ws][f] for ws in order] for f in _FIELDS]
                )
            )
            next_ms = min(
                (ws + win_us) // 1_000
                + (late_ms if windows[ws]["fired"] else 0)
                for ws in order
            )
            state.setTimeoutTimestamp(
                max(next_ms - flink_off_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()

        yield pd.DataFrame(out, columns=cols)

    return (
        trades.withWatermark("ts", f"{delay_s} seconds")
        .groupBy("product")
        .applyInPandasWithState(
            fn,
            outputStructType=LATENESS_OUTPUT_SCHEMA,
            stateStructType=LATENESS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
