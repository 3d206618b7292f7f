"""Differential correctness: every registered query vs its DuckDB
oracle at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from kafka_flink_spark.suite import all_queries
from tests.conftest import SF_SMALL, register_duck_views
from tests.helpers import assert_frames_match

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, SF_SMALL)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver parity)
        return
    register_duck_views(duck, SF_SMALL)
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)
