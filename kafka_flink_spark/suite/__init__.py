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
  returns HUGEINT) — including window sums (``sum() OVER``) and any
  arithmetic derived from them, which otherwise leak HUGEINT into
  pandas as float64 while Spark sends int64;
* array columns render as delimiter-joined strings on both sides
  (Spark ``array_join``, DuckDB ``array_to_string``) — the driver's
  canonicalizer sorts every column in pandas, and numpy arrays are
  unhashable there.
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


# Driver-verification rotation. The correctness driver samples the
# FIRST 50 queries in iteration order each round. Cumulative state
# after r9: 293/293 registered queries green on their newest driver
# row, none older than round 4 (VERDICT r9). Round 10 executes
# VERDICT r9 task 1 verbatim: lead with the two queries whose code
# changed in r9 AFTER their newest driver row (t40_stupid_backoff_lm,
# newest row r8; io12_exactly_once_sink, newest row r5 — both
# judge-verified PASS first-hand but driver rows win), then the 43
# r4-era rows in their CORRECTNESS_r04 order, then the 5 oldest
# r5-era rows in their CORRECTNESS_r05 order. After this round no
# registered query's newest driver row is older than r5.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- changed-after-newest-row leads (2) ----
    "t40_stupid_backoff_lm",
    "io12_exactly_once_sink",
    # ---- round-4-era rows (43), CORRECTNESS_r04 order ----
    "w21_stream_outer_interval_join",
    "w22_stream_dedup_within_watermark",
    "w23_stream_full_outer_interval_join",
    "w24_stream_semi_join",
    "w25_stream_corpus_ingest",
    "t16_bpe_pair_counts",
    "t17_cdc_chunk_dedup",
    "t18_bigram_lm_score",
    "t19_ngram_novelty",
    "t20_inverted_index",
    "t21_pmi_collocations",
    "t22_stratified_exact_sample",
    "t23_dup_substring_spans",
    "t24_deterministic_shuffle",
    "t27_substring_dedup_rewrite",
    "d9_incremental_dedup",
    "v7_ann_knn_graph",
    "v8_ivf_learned_topk",
    "v9_random_projection",
    "gr2_triangle_count",
    "pipe5_curriculum_order",
    "pipe6_temperature_mix",
    "j8_bloom_prune_semi_join",
    "j9_asof_join_forward",
    "j10_range_join_binned",
    "j11_fuzzy_name_match",
    "e9_event_transitions",
    "e10_daily_anomalies",
    "g17_approx_top_k",
    "g18_exact_percentiles",
    "sc10_variant_functions",
    "sc11_collation_group",
    "io8_xml_roundtrip",
    "io9_zorder_layout",
    "io10_schema_evolution_merge",
    "io11_dynamic_partition_overwrite",
    "u9_arrow_python_udf",
    "m7_real_media_probe",
    "t29_gopher_quality_rules",
    "t30_winnowing_fingerprints",
    "v10_ann_recall_eval",
    "w5_distribution_ranks",
    "w26_stream_topk_complete",
    # ---- oldest round-5-era rows (5), CORRECTNESS_r05 order ----
    "t31_bm25_scores",
    "v11_pq_adc_topk",
    "pipe7_web_corpus_pipeline",
    "g19_mode_median_minmax_by",
    "set4_bag_semantics",
    # ---- 50-query budget line (round 10): exactly 2 + 43 + 5 = 50 ----
    # Round-11 rotation queue (replace this tuple at r11 start): lead
    # with any r10 non-green and any queries edited after their newest
    # driver row, then the remaining r5-era rows oldest-first.
)


def all_queries() -> dict[str, Query]:
    _load()
    front = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY}
    rest = {n: q for n, q in _REGISTRY.items() if n not in front}
    return {**front, **rest}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark_fn for q in all_queries().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
