"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "open" in df.columns and "volume" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0


def test_cluster_conf_scales_with_shape():
    from kafka_flink_spark.session import cluster_conf

    c = cluster_conf(executors=100, cores_per_executor=8)
    assert c["spark.sql.shuffle.partitions"] == "1600"
    assert "RocksDBStateStoreProvider" in c["spark.sql.streaming.stateStore.providerClass"]
    # runtime confs ride along so a deploy gets the same semantics
    assert c["spark.sql.session.timeZone"] == "UTC"
