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

import pandas as pd
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


def simhash_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    num_chunks: int | None = None,
) -> DataFrame:
    """Streaming NEAR-dup detection against all history — dedup-on-
    ingest: each arriving document is checked for hamming-close
    SimHash signatures among every document that arrived before it,
    and matches emit ``(doc_id, dup_of, hamming)`` rows.

    This is the streaming member of the near-dup family: d5 is the
    batch pair join, d9 the batch-vs-corpus incremental probe; here
    the corpus index LIVES IN THE STATE STORE and grows as the stream
    runs. Shape:

    1. per-row signature: one Arrow-batched pandas UDF computes the
       60-bit SimHash exactly as operators/dedup.simhash does
       (md5-long per token occurrence, majority vote per bit) — the
       batch form is a corpus aggregation, the stream form is a
       per-row projection, and both reduce to the same integer;
    2. chunk banding (the d5 pigeonhole): with num_chunks >
       max_hamming, a qualifying pair is bit-identical in >= 1 chunk,
       so candidate checks happen only inside (chunk_id, chunk_key)
       state groups — the stream never compares all-pairs;
    3. ``applyInPandasWithState`` keyed by (chunk_id, chunk_key):
       state = the bucket's (ids, sigs) arrays; arriving rows are
       processed in ``doc_id`` order, each verified against the
       bucket history (exact ``bit_count(xor)``), then appended.

    "Earlier" is defined by ``doc_id`` order (rows inside one
    micro-batch are folded in id order; callers replay files in id
    ranges), so the emitted match set is deterministic and equals the
    batch predicate *exists j < i with hamming(sig_i, sig_j) <=
    max_hamming* — the oracle of the registered query. A pair sharing
    several chunks emits in each; consumers take min(dup_of) per doc.

    State at 100 TB: one long per doc per chunk — signatures only,
    never text. A boilerplate family concentrates one bucket exactly
    like d5's batch join; the same hub-star cap applies if needed
    (kept exact here; d13 evidences the capped contract in batch).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from kafka_flink_spark.operators.dedup import SIMHASH_BITS

    if num_chunks is None:
        num_chunks = max_hamming + 1
    if num_chunks <= max_hamming:
        raise ValueError(
            f"num_chunks ({num_chunks}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole recall guarantee"
        )

    def _simhash_series(texts: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for text in texts:
            toks = ("" if text is None else text).split(" ")
            ones = [0] * SIMHASH_BITS
            for t in toks:
                h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                for i in range(SIMHASH_BITS):
                    ones[i] += (h >> i) & 1
            n = len(toks)
            sig = 0
            for i, o in enumerate(ones):
                if o * 2 > n:
                    sig |= 1 << i
            out.append(sig)
        return pd.Series(out, dtype="int64")

    simhash_py = F.pandas_udf(_simhash_series, "long")

    sigs = docs.select(F.col(id_col).alias("doc_id"), simhash_py(text_col).alias("sig"))

    base, extra = divmod(SIMHASH_BITS, num_chunks)
    chunk_exprs, off = [], 0
    for c in range(num_chunks):
        width = base + (1 if c < extra else 0)
        chunk_exprs.append(
            F.shiftright("sig", off).bitwiseAND(F.lit((1 << width) - 1)).cast("long")
        )
        off += width
    banded = sigs.select(
        "doc_id", "sig", F.posexplode(F.array(*chunk_exprs)).alias("chunk_id", "chunk_key")
    )

    out_schema = "doc_id long, dup_of long, hamming int"
    state_schema = "ids array<long>, sigs array<long>"

    def fn(key, pdfs, state: GroupState):
        ids: list[int] = []
        hist: list[int] = []
        if state.exists:
            ids, hist = [list(x) for x in state.get]
        rows = []
        batch = []
        for pdf in pdfs:
            batch.extend(zip(pdf["doc_id"].tolist(), pdf["sig"].tolist()))
        batch.sort()
        for doc_id, sig in batch:
            for j, prev_sig in zip(ids, hist):
                ham = (sig ^ prev_sig).bit_count()
                if ham <= max_hamming:
                    rows.append((doc_id, j, ham))
            ids.append(doc_id)
            hist.append(sig)
        state.update((ids, hist))
        yield pd.DataFrame(rows, columns=["doc_id", "dup_of", "hamming"])

    return (
        banded.groupBy("chunk_id", "chunk_key")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
