"""Scale-up measurements for the round-3b operators: substring-dup
spans (t23), deterministic shuffle (t24), BPE training loop (t25),
curriculum ordering (pipe5). Same recipe as scaling_r3.py: synthetic
spark.range inputs at 1x / 10x, noop-sink walls for SCALING.md."""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafka_flink_spark.session import get_session  # noqa: E402
from scripts.scaling_r3 import synth_docs, t  # noqa: E402


def main() -> None:
    spark = get_session("scaling-r3b")
    from kafka_flink_spark.operators.text import (
        bpe_train,
        curriculum_order,
        deterministic_shuffle,
        duplicated_window_spans,
    )

    from kafka_flink_spark.operators.text import remove_duplicate_spans

    print("== duplicated_window_spans (k=8) ==", flush=True)
    for n in (5_000, 50_000):
        w = t(duplicated_window_spans(synth_docs(spark, n)))
        print(f"docs={n:>8,} wall={w:5.1f}s", flush=True)

    print("== remove_duplicate_spans (k=8) ==", flush=True)
    for n in (5_000, 50_000):
        w = t(remove_duplicate_spans(synth_docs(spark, n)))
        print(f"docs={n:>8,} wall={w:5.1f}s", flush=True)

    print("== deterministic_shuffle (1k shards) ==", flush=True)
    for n in (1_000_000, 10_000_000):
        df = spark.range(n).select(F.col("id").alias("doc_id"))
        w = t(deterministic_shuffle(df, n_shards=1024))
        print(f"docs={n:>11,} wall={w:5.1f}s", flush=True)

    print("== bpe_train (8 merges) ==", flush=True)
    for n in (5_000, 50_000):
        t0 = time.perf_counter()
        bpe_train(synth_docs(spark, n), num_merges=8).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"docs={n:>8,} wall={time.perf_counter() - t0:5.1f}s", flush=True)

    print("== curriculum_order (8 shards) ==", flush=True)
    for n in (50_000, 500_000):
        w = t(curriculum_order(synth_docs(spark, n, words=40)))
        print(f"docs={n:>8,} wall={w:5.1f}s", flush=True)


if __name__ == "__main__":
    main()
