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


def test_driver_priority_names_all_registered():
    """A typo in the rotation list would silently waste driver budget."""
    from kafka_flink_spark import suite

    qs = suite.all_queries()
    missing = [n for n in suite._DRIVER_PRIORITY if n not in qs]
    assert missing == []
    assert len(set(suite._DRIVER_PRIORITY)) == len(suite._DRIVER_PRIORITY)
    # rotation actually floats the priority block to the front
    assert list(qs)[: len(suite._DRIVER_PRIORITY)] == list(suite._DRIVER_PRIORITY)


def test_cluster_conf_scales_with_shape():
    from kafka_flink_spark.session import cluster_conf

    c = cluster_conf(executors=100, cores_per_executor=8)
    assert c["spark.sql.shuffle.partitions"] == "1600"
    assert "RocksDBStateStoreProvider" in c["spark.sql.streaming.stateStore.providerClass"]
    # runtime confs ride along so a deploy gets the same semantics
    assert c["spark.sql.session.timeZone"] == "UTC"
