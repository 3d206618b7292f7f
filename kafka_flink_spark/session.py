"""SparkSession factory with scale-aware defaults.

The reference pins everything to parallelism 1 (``old/flink.py:9``); we
instead default to Spark AQE so partition counts adapt at runtime — the
same code path that serves local[32] tests serves a 1000-executor
cluster, because nothing below hard-codes a cluster size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-mutable confs we also (re)apply to externally provided
# sessions (e.g. the verification driver's) so query behavior is
# deterministic regardless of who built the SparkSession.
RUNTIME_CONF = {
    # Deterministic timestamp formatting across engines/oracles.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive query execution: runtime shuffle-partition coalescing,
    # skew-join splitting, and dynamic broadcast conversion. This is
    # the main "would it survive 100x scale-up" knob — partition
    # counts are decided from observed sizes, not hard-coded.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / applyInPandas boundary crossing.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The events fixture stores TIMESTAMP(NANOS) parquet, which Spark 4
    # rejects outright; read it as a LONG of nanos and convert at the
    # source wrapper (sources/fixtures.py) with exact integer division.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-mutable conf on this build — keep the session usable.
            pass
    return spark


def get_session(
    app_name: str = "kafka_flink_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so the same entry point works for tests and bench.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_conf(spark)
