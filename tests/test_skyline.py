"""Hand-case pins for the distributed 2D skyline operator."""

from __future__ import annotations


def test_skyline_hand_graph(spark):
    """Duplicates co-survive (neither dominates); a point beaten on
    one dim but better on the other stays; a strictly-worse point
    drops."""
    from kafka_flink_spark.operators.skyline import skyline_2d

    d = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 10), (3, 2, 9), (4, 2, 11), (5, 5, 5)],
        "id long, x long, y long",
    )
    got = sorted(r.id for r in skyline_2d(d, "x", "y").collect())
    # (2,11) is dominated by (1,10); the (1,10) duplicates co-survive
    assert got == [1, 2, 3, 5]


def test_skyline_degenerate_single_x(spark):
    """All rows share one x (zero span, every row in bucket 0): only
    the min-y rows survive, duplicates together."""
    from kafka_flink_spark.operators.skyline import skyline_2d

    d = spark.createDataFrame(
        [(1, 7, 3), (2, 7, 2), (3, 7, 2)], "id long, x long, y long"
    )
    got = sorted(r.id for r in skyline_2d(d, "x", "y").collect())
    assert got == [2, 3]


def test_skyline_cross_bucket_dominance(spark):
    """A point in a later value bucket must be killed by a better
    point in an earlier bucket (the broadcast cumulative-min
    handoff): with num_buckets=4 and x spanning 0..100, x=90/y=5 is
    dominated by x=0/y=1 two buckets away."""
    from kafka_flink_spark.operators.skyline import skyline_2d

    d = spark.createDataFrame(
        [(1, 0, 1), (2, 90, 5), (3, 100, 0)], "id long, x long, y long"
    )
    got = sorted(r.id for r in skyline_2d(d, "x", "y", num_buckets=4).collect())
    assert got == [1, 3]
