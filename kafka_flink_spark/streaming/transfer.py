"""Stream pass-through / transfer pipelines (P4/W13 — reference
``1_transfer.py``: consume topic A, produce topic B unchanged).

The Kafka→Kafka form lives in ``sources/kafka_io.topic_transfer`` (it
moves raw key/value bytes, no parse, no shuffle). This module carries
the source-agnostic form used by tests and by file-landing pipelines:
stream in → identical rows out, exactly-once via checkpointing.

Scale: a transfer is a narrow, stateless plan — parallelism equals the
source's partitioning (Kafka partitions / input files), there is no
exchange, and throughput is I/O-bound. The micro-batch engine gives
at-least-once into Kafka and exactly-once into files out of the box.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def file_stream_transfer(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    dst_dir: str,
    checkpoint_dir: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Replay files from ``src_dir`` and land identical rows in
    ``dst_dir`` (the file-based analog of topic transfer; run to
    completion with availableNow)."""
    stream = spark.readStream.schema(schema).format(fmt).load(src_dir)
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_transfer_")
    q = (
        stream.writeStream.format(fmt)
        .option("path", dst_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def transfer(stream_df: DataFrame, sink_format: str, sink_options: dict[str, str]):
    """Generic pass-through: any streaming frame → any sink, unchanged.
    Returns the started query (caller owns lifecycle)."""
    writer = stream_df.writeStream.format(sink_format)
    for k, v in sink_options.items():
        writer = writer.option(k, v)
    return writer.outputMode("append").start()
