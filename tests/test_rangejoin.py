"""Bucketized interval join semantics + plan shape."""

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.rangejoin import interval_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _intervals(spark, rows):
    return (
        spark.createDataFrame(rows, "iid long, s string, e string")
        .withColumn("s", F.col("s").cast("timestamp"))
        .withColumn("e", F.col("e").cast("timestamp"))
    )


def test_interval_join_containment(spark):
    points = _points(
        spark,
        [
            (1, "2024-01-01 10:30:00"),  # inside i1
            (2, "2024-01-01 11:00:00"),  # at i1 end → excluded from i1, inside i2
            (3, "2024-01-01 10:00:00"),  # exactly at i1 start → included
            (4, "2024-01-02 00:00:00"),  # no interval
            (5, "2024-01-01 10:45:00"),  # inside i1 AND i2 (overlap)
        ],
    )
    intervals = _intervals(
        spark,
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            (2, "2024-01-01 10:40:00", "2024-01-01 12:00:00"),
            # multi-bucket interval (crosses several 1h buckets)
            (3, "2024-01-01 15:30:00", "2024-01-01 18:30:00"),
        ],
    )
    out = interval_join(points, intervals, "ts", "s", "e", bucket_width_s=3600)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 1), (2, 2), (3, 1), (5, 1), (5, 2)]

    # point inside the multi-bucket interval matches exactly once
    p6 = _points(spark, [(6, "2024-01-01 17:59:00")])
    out6 = interval_join(p6, intervals, "ts", "s", "e", bucket_width_s=3600)
    assert [(r["pid"], r["iid"]) for r in out6.collect()] == [(6, 3)]


def test_interval_join_is_equi_join(spark):
    points = _points(spark, [(1, "2024-01-01 10:30:00")])
    intervals = _intervals(spark, [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00")])
    out = interval_join(points, intervals, "ts", "s", "e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole point: no nested-loop/cartesian physical join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_rejects_outer(spark):
    """Outer variants would silently drop their null-extended rows at
    the post-join containment filter (inner-in-disguise) — refused."""
    import pytest

    from yandex_tracker_exporter_spark.operators.rangejoin import interval_join

    p = spark.createDataFrame([("2024-01-01 00:30:00",)], "ts string")
    i = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00")], "s string, e string"
    )
    with pytest.raises(ValueError, match="inner"):
        interval_join(p, i, "ts", "s", "e", how="left")


def test_interval_join_degenerate_intervals_drop_quietly(spark):
    """Round-9 pins: an INVERTED interval (start > end) and a NULL
    bound both produce zero matches without crashing — sequence() with
    start > end steps DOWN in Spark (wasted buckets, but the
    containment predicate start <= p < end is vacuously false), and a
    NULL bound nulls the sequence, dropping the interval at explode."""
    import datetime as dt

    T = dt.datetime.fromisoformat
    pts = spark.createDataFrame(
        [(1, T("2024-01-01 10:00:00"))], "pid long, pts timestamp"
    )
    inverted = spark.createDataFrame(
        [(7, T("2024-01-02 00:00:00"), T("2024-01-01 00:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    nullb = spark.createDataFrame(
        [(8, None, T("2024-01-01 23:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    assert interval_join(pts, inverted, "pts", "s", "e").collect() == []
    assert interval_join(pts, nullb, "pts", "s", "e").collect() == []
