"""Scale-technique guards: salted joins and bucketed co-located joins."""

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.skew import salted_join


def test_salted_join_preserves_semantics(spark):
    # heavily skewed large side: 90% of rows share one key
    large = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = large.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(large, small, "k", num_salts=8).select("k", "payload", "dim")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-partitions data at rest:
    the join plans with NO Exchange on either side — the co-located join
    the brief calls for (at 100 TB this is the difference between a
    full-table shuffle and none)."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 100).alias("o_custkey")
    )
    customer = spark.range(100).select(
        F.col("id").alias("c_custkey"), F.concat(F.lit("c"), F.col("id")).alias("c_name")
    )
    (
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
    )

    joined = (
        spark.table("b_orders")
        .hint("merge")  # force sort-merge so bucketing (not broadcast) is tested
        .join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # co-located: zero shuffles
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_rejects_outer_small_side(spark):
    """right/full outer would emit unmatched small rows once per salt —
    the operator must refuse instead of silently duplicating."""
    import pytest

    large = spark.createDataFrame([(1, "a")], "k long, payload string")
    small = spark.createDataFrame([(1, "d")], "k long, dim string")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="not semantics-preserving"):
            salted_join(large, small, "k", how=how)
    # left family still works
    assert salted_join(large, small, "k", how="left").count() == 1
    assert salted_join(large, small, "k", how="left_semi").count() == 1
