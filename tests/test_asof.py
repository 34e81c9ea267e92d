"""As-of join operator semantics."""

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "e1"),  # after v2
            (1, "2024-01-01 08:30:00", "e2"),  # between v1 and v2
            (1, "2024-01-01 07:00:00", "e3"),  # before any version
            (1, "2024-01-01 09:00:00", "e4"),  # exactly AT v2 → sees v2
            (2, "2024-01-01 10:00:00", "e5"),  # key with no right rows
        ],
        "k long, ts string, ev string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 08:00:00", "v1"),
            (1, "2024-01-01 09:00:00", "v2"),
        ],
        "k long, vts string, version string",
    ).withColumn("vts", F.col("vts").cast("timestamp"))

    out = asof_join(left, right, key="k", left_ts="ts", right_ts="vts")
    got = {r["ev"]: r["version"] for r in out.collect()}
    assert got == {"e1": "v2", "e2": "v1", "e3": None, "e4": "v2", "e5": None}
    assert out.count() == left.count()  # left-preserving


def test_asof_join_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("ev"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("vts"),
        F.col("id").alias("version"),
    )
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="vts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash shuffle on the key — the union+window trick must not
    # produce a join or a second exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_junk_right_rows_never_match(spark):
    """Round-9 latent-input pins: a NULL-ts right row used to sort
    FIRST in the carry window and become the as-of match for every
    left row earlier than the first real quote (rows that should get
    NULL got the junk payload); a NULL-key right row used to match
    NULL-key left rows through the window partition, diverging from
    equi-join semantics."""
    import datetime as dt

    T = dt.datetime.fromisoformat
    left = spark.createDataFrame(
        [(1, T("2024-01-01 09:00:00")), (1, T("2024-01-01 12:00:00")),
         (None, T("2024-01-01 09:00:00"))],
        "k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, None, 999.0),                            # junk: no timestamp
         (None, T("2024-01-01 08:00:00"), 555.0),     # junk: no key
         (1, T("2024-01-01 10:00:00"), 10.0)],
        "k long, rts timestamp, px double",
    )
    out = {(r["k"], r["lts"].hour): r["px"]
           for r in asof_join(left, right, "k", "lts", "rts").collect()}
    assert out == {(1, 9): None, (1, 12): 10.0, (None, 9): None}
