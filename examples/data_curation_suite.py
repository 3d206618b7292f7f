"""Training-data curation + customer analytics — the session-6 public
surface, composed exactly as a production run would:

    python examples/data_curation_suite.py

1. line-level dedup (CCNet keep-first): per-doc dropped-token
   accounting before LM filtering,
2. DSIR importance scoring: which documents look like the target
   domain (hashed-ngram importance weights, integer-exact),
3. entity resolution: blocked fuzzy pairs -> transitive closure ->
   one canonical golden record per entity,
4. link prediction: the strongest never-bought-together part pairs
   (Resource-Allocation index over the co-purchase graph),
5. CUSUM changepoints + seasonal decomposition of daily event counts
   (the monitoring pair: sustained shifts vs weekly rhythm),
6. RFM segmentation: quartile-coded customer segments without a
   single global sort,
7. cogrouped as-of stamping: every event annotated with the user's
   latest prior purchase via cogroup + merge_asof.

Swap the fixture reads for the production lake and this file IS the
job: every stage is declarative, broadcast-bounded, and reads nothing
to the driver except the summaries printed.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import spark_queries

    spark = get_session("data-curation-example")
    qs = spark_queries()

    ld = qs["t36_line_dedup"](spark, SF_DIR)
    agg = ld.agg(
        F.sum("n_lines").alias("lines"),
        F.sum("n_dup_lines").alias("dups"),
        F.sum("dropped_tokens").alias("dropped"),
    ).first()
    print(
        f"1. line dedup: {agg['lines']} lines, {agg['dups']} duplicates "
        f"dropped ({agg['dropped']} tokens)"
    )

    imp = qs["t37_dsir_importance"](spark, SF_DIR)
    top = imp.orderBy(F.desc("mean_imp_e9"), "doc_id").first()
    print(
        f"2. DSIR: {imp.count()} docs scored; most target-like doc "
        f"{top.doc_id} (mean ratio {top.mean_imp_e9 / 1e9:.3f})"
    )

    er = qs["pipe9_entity_resolution"](spark, SF_DIR)
    n_entities = er.filter("is_canonical = 1").count()
    n_merged = er.filter("entity_size > 1").count()
    print(
        f"3. entity resolution: {er.count()} records -> {n_entities} "
        f"entities ({n_merged} records merged into multi-member entities)"
    )

    print("4. top predicted missing links (parts never bought together):")
    for r in qs["gr8_link_prediction"](spark, SF_DIR).limit(3).collect():
        print(f"   parts {r.part_u} <-> {r.part_w}  ra={r.ra_e12 / 1e12:.4f}")

    ch = qs["e18_cusum_changepoint"](spark, SF_DIR)
    flagged = ch.filter("is_change").count()
    sd = qs["e19_seasonal_decompose"](spark, SF_DIR)
    print(
        f"5. monitoring: {flagged} CUSUM-flagged days of {ch.count()}; "
        f"seasonal profile spans {sd.select('weekday').distinct().count()} weekdays"
    )

    print("6. RFM segments:")
    seg = (
        qs["fe5_rfm_segmentation"](spark, SF_DIR)
        .groupBy("segment")
        .count()
        .orderBy("segment")
    )
    for r in seg.collect():
        print(f"   {r.segment:12s} {r['count']:5d} customers")

    asof = qs["u10_cogrouped_asof"](spark, SF_DIR)
    prior = asof.filter("has_prior = 1").count()
    print(
        f"7. cogrouped as-of: {asof.count()} events stamped, "
        f"{prior} carry a prior purchase value"
    )

    spark.stop()


if __name__ == "__main__":
    main()
