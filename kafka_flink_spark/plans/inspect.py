"""Physical-plan inspection helpers.

The scale contract (100 TB / 1000 executors) is enforced here as
assertions over ``explain("formatted")`` output rather than hope:
filters and projections must reach the parquet scan (PushedFilters /
ReadSchema), small-dimension joins must broadcast, narrow pipelines
must fuse into whole-stage codegen, and shuffle counts must match the
minimum the semantics require. tests/test_plans.py pins these for the
headline queries — a regression that un-pushes a filter or turns a
broadcast join into a sort-merge join fails CI, not the cluster bill.

(The reference delegates all physical planning to Flink and never
inspects it; SURVEY.md §4.1.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The plan exactly as ``df.explain(mode)`` would print it."""
    qe = df._jdf.queryExecution()  # noqa: SLF001 — no public string API
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates the scans received (empty list = nothing pushed)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (column-pruning check):
    one list per scan node's ReadSchema."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        fields = [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
        cols.append(fields)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df) or "BroadcastNestedLoopJoin" in plan_string(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the initial physical plan (AQE may later
    coalesce partitions but cannot remove a semantic shuffle).
    Broadcast exchanges are excluded — they move the small side only.
    Formatted mode lists each shuffle as an ``(N) Exchange`` block."""
    plan = plan_string(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.M))


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of fused whole-stage codegen spans (wider = fewer
    interpreter boundaries). AQE's pre-execution explain hides codegen
    annotation, so planning runs with AQE off for this probe only —
    the df itself is untouched (plans are derived lazily per call)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # simple mode marks each codegen'd node with a *(span_id) prefix
        return len(set(re.findall(r"\*\((\d+)\)", plan_string(df, "simple"))))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
