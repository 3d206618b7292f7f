"""File-backed Kafka-shaped log source with real start-position
semantics (SURVEY.md §2.1 S2/S3).

The sandbox has no broker, so ``kafka_io.kafka_json_source``'s
``startingOffsets`` remained a structural option shim — passed through
to the Kafka connector but never *executed*. This module makes the
semantics executable and testable without a broker: a "topic" is a
directory of append-only JSONL segment files (one record per line,
named ``segment-<start_offset>.jsonl`` with the global offset of their
first record zero-padded in the name, exactly how a broker's log
segments carry their base offset), and a Spark 4 Python DataSource
reads it as ``(offset long, value string)`` — the Kafka wire shape —
in batch (explicit offset ranges) or streaming (``earliest`` /
``latest`` start positions, checkpointed micro-batch offsets,
bit-exact replay of any offset range because the log IS its own
write-ahead log).

Semantics mirrored from the reference's consumer configuration
(``old/kfk.py:64`` start-position control; ``3_ohlc.py:32-36``):

* ``earliest`` — first stream start reads from offset 0;
* ``latest`` — first stream start begins at the CURRENT end of the
  log: records already present are skipped, records appended after
  the stream starts are read. On restart from a checkpoint the stored
  offset wins, as with the real Kafka connector.

Scale notes: segment base offsets live in file names, so planning
needs to line-count only the TAIL segment (the writer seals earlier
segments); batch reads plan one input partition per segment —
parallelism tracks segment count like Kafka parallelism tracks topic
partitions. Paths must be on shared storage for a multi-executor
cluster (same contract as every file source).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

KAFKA_LOG_SCHEMA = "offset long, value string"

_SEG_PREFIX = "segment-"
_SEG_SUFFIX = ".jsonl"
_SEG_DIGITS = 20


def _segment_name(base_offset: int) -> str:
    return f"{_SEG_PREFIX}{base_offset:0{_SEG_DIGITS}d}{_SEG_SUFFIX}"


def _segments(path: str) -> list[tuple[int, str]]:
    """(base_offset, absolute_path) per segment, offset-ordered."""
    out = []
    for name in os.listdir(path):
        if name.startswith(_SEG_PREFIX) and name.endswith(_SEG_SUFFIX):
            base = int(name[len(_SEG_PREFIX) : -len(_SEG_SUFFIX)])
            out.append((base, os.path.join(path, name)))
    out.sort()
    return out


def _count_lines(file_path: str) -> int:
    with open(file_path, "rb") as f:
        return sum(1 for _ in f)


def end_offset(path: str) -> int:
    """One past the last record: tail segment's base + its line count
    (earlier segments' extents are implied by their successors' bases)."""
    segs = _segments(path)
    if not segs:
        return 0
    base, tail = segs[-1]
    return base + _count_lines(tail)


def append_segment(path: str, values: list[str]) -> int:
    """Producer-side helper (the test harness's broker stand-in): seal
    ``values`` as the next segment; returns its base offset. Writes to
    a temp name then renames — readers never observe a partial file."""
    os.makedirs(path, exist_ok=True)
    base = end_offset(path)
    final = os.path.join(path, _segment_name(base))
    tmp = final + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for v in values:
            f.write(v)
            f.write("\n")
    os.replace(tmp, final)
    return base


class KafkaLogDataSource(DataSource):
    """``spark.read.format("kafka_log")`` / ``spark.readStream...``.

    Options: ``path`` (required), batch ``startingOffset`` /
    ``endingOffset`` (global record offsets; default 0 / log end),
    streaming ``startingOffsets`` = ``earliest`` (default) | ``latest``.
    """

    @classmethod
    def name(cls) -> str:
        return "kafka_log"

    def schema(self) -> str:
        return KAFKA_LOG_SCHEMA

    def reader(self, schema) -> "KafkaLogBatchReader":
        return KafkaLogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> "KafkaLogStreamReader":
        return KafkaLogStreamReader(self.options)


class KafkaLogBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options["path"]
        self.start = int(options.get("startingOffset", "0"))
        end = options.get("endingOffset")
        self.end = int(end) if end is not None else end_offset(self.path)

    def partitions(self):
        # One split per segment, bounds from the NEXT segment's base
        # (tail bound comes from the reader's end offset) — no line
        # counting at plan time beyond what end_offset already did.
        segs = _segments(self.path)
        parts = []
        for i, (base, file_path) in enumerate(segs):
            seg_end = segs[i + 1][0] if i + 1 < len(segs) else self.end
            lo, hi = max(base, self.start), min(seg_end, self.end)
            if lo < hi:
                parts.append(InputPartition((file_path, base, lo, hi)))
        return parts or [InputPartition((None, 0, 0, 0))]

    def read(self, partition: InputPartition):
        file_path, base, lo, hi = partition.value
        if file_path is None:
            return
        with open(file_path, encoding="utf-8") as f:
            for offset, line in enumerate(f, start=base):
                if offset >= hi:
                    break
                if offset >= lo:
                    yield (offset, line.rstrip("\n"))


class KafkaLogStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offsets are ``{"offset": n}`` dicts; every
    batch is an exact offset range replayable from the segment files,
    so checkpoint recovery re-reads identical rows (exactly-once into
    idempotent sinks, the io12 contract)."""

    def __init__(self, options) -> None:
        self.path = options["path"]
        self.starting = options.get("startingOffsets", "earliest").lower()
        if self.starting not in ("earliest", "latest"):
            raise ValueError(
                f"startingOffsets must be earliest|latest, got {self.starting!r}"
            )

    def initialOffset(self) -> dict:
        # Evaluated once per NEW checkpoint; a restart resumes from the
        # checkpointed offset instead (Structured Streaming contract,
        # same as the Kafka connector's startingOffsets handling).
        return {"offset": 0 if self.starting == "earliest" else end_offset(self.path)}

    def read(self, start: dict):
        lo = start["offset"]
        hi = end_offset(self.path)
        if hi <= lo:
            # Empty no-advance batch: the wrapper VALIDATES these with
            # next(it) — must be an iterator. Advancing batches below
            # are concrete lists — the wrapper's prefetch cache
            # copy.copy()s them per consumer, which a generator can't
            # survive (same contract as trade_gen).
            return iter(()), {"offset": lo}
        return self._rows(lo, hi), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay path (checkpoint recovery): runs in the read worker,
        # which requires an iterator return.
        return iter(self._rows(start["offset"], end["offset"]))

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        out = []
        for base, file_path in _segments(self.path):
            if base >= hi:
                break
            with open(file_path, encoding="utf-8") as f:
                for offset, line in enumerate(f, start=base):
                    if offset >= hi:
                        break
                    if offset >= lo:
                        out.append((offset, line.rstrip("\n")))
        return out


def register_kafka_log(spark) -> None:
    """Idempotently register the source with a session."""
    try:
        spark.dataSource.register(KafkaLogDataSource)
    except Exception:
        pass  # already registered on this session


def write_trade_log(path: str, n_rows: int, segment_rows: int = 2500) -> None:
    """Build a deterministic trade log from the public generator recipe
    (sources/trade_gen.trade_row): n_rows JSON envelopes split into
    fixed-size sealed segments. Offsets equal seq by construction —
    what a single-partition broker topic fed by the reference's
    old/gen.py producer would contain."""
    from kafka_flink_spark.sources.trade_gen import trade_row

    for base in range(0, n_rows, segment_rows):
        values = []
        for seq in range(base, min(base + segment_rows, n_rows)):
            seq_, ts_ms, instrument_id, product, price, qty = trade_row(seq, 2000, 100)
            values.append(
                json.dumps(
                    {
                        "seq": seq_,
                        "ts_ms": ts_ms,
                        "instrument_id": instrument_id,
                        "product": product,
                        "price": price,
                        "qty": qty,
                    },
                    separators=(",", ":"),
                )
            )
        append_segment(path, values)
