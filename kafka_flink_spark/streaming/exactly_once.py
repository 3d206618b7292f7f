"""Exactly-once streaming file sink: foreachBatch + idempotent
per-batch-id overwrite — the standard Spark recipe for sinks without
a native transactional streaming writer.

Structured Streaming's contract for ``foreachBatch`` is
at-least-once: after a crash the last in-flight micro-batch replays
with the SAME ``batch_id``. Making the write a deterministic
OVERWRITE of a directory keyed by that id turns replay into a no-op
rewrite of identical bytes, so the end-to-end pipeline is effectively
exactly-once (the same reasoning the JDBC sink applies with
``DELETE WHERE batch_id = ?; INSERT``).

The checkpoint (WAL + commit log) is what makes restarts resume from
the right offset; the idempotent write is what makes the overlap
harmless. Both halves are exercised by the io12 suite query (double
run from one checkpoint) and the recovery pytest.

LOCAL-MODE ASSUMPTION (as sources/fixtures.scratch_dir): paths must
be on shared storage on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_idempotent_parquet_sink(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, failpoint=None
) -> None:
    """Drain ``stream_df`` (availableNow) into ``out_dir`` with one
    parquet directory per micro-batch id, overwrite-idempotent under
    replay. Read the result back with
    ``spark.read.parquet(out_dir + "/batch_id=*")`` (or the plain
    directory — the layout is hive-partitioned on batch_id).

    ``failpoint(batch_id)`` is a crash-injection hook invoked after a
    batch's parquet write but before the batch commits to the
    checkpoint — the exact window a real mid-batch crash hits (sink
    bytes durable, offset not). Recovery tests raise from it, then
    restart from the same checkpoint: the batch replays under the
    SAME id and the overwrite makes the replay a no-op rewrite."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        if failpoint is not None:
            failpoint(batch_id)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
