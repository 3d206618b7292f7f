"""Query suite registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-data
extensions) registers here as a named pair:

* a Spark callable ``(spark, sf_dir) -> DataFrame`` — the engine path;
* an equivalent ANSI-SQL string for DuckDB — the differential oracle
  (omitted only for genuinely non-SQL-expressible operators, which the
  driver then checks rows-only).

Conventions that keep the driver's order-insensitive value-hash
comparison meaningful (driver contract, ``__spark_entry__.py``):

* every computed column is aliased identically on both sides;
* timestamps are rendered to ``yyyy-MM-dd HH:mm:ss[.SSSSSS]`` strings
  (UTC) on both sides — engine-native timestamp objects stringify
  differently across Spark/DuckDB/pandas;
* aggregated doubles are rounded to a fixed scale on both sides (sum
  order differs between engines; raw parquet doubles pass through
  un-rounded since both engines read identical bits);
* integer aggregates are cast to BIGINT on both sides (DuckDB SUM
  returns HUGEINT).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from kafka_flink_spark.session import apply_runtime_conf


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Suite modules; importing them populates the registry. Ordered so a
# time-budgeted consumer iterating queries() in insertion order hits
# the flagship candles, training-data ops, and streaming executions
# before the (large, conventional) relational tail.
_MODULES = (
    "kafka_flink_spark.suite.candles_queries",
    "kafka_flink_spark.suite.llm_queries",
    "kafka_flink_spark.suite.streaming_queries",
    "kafka_flink_spark.suite.events_queries",
    "kafka_flink_spark.suite.warehouse_queries",
    "kafka_flink_spark.suite.relational_queries",
    "kafka_flink_spark.suite.io_queries",
    "kafka_flink_spark.suite.rich_udf_queries",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name, wrapped, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark_fn for q in all_queries().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
