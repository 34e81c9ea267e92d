"""Grouped custom aggregation: pandas vs native-median equivalence."""

import pytest

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.grouped import (
    exact_median_gap,
    median_gap_native,
)
from yandex_tracker_exporter_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_native_median_equals_pandas_path(spark):
    """median_gap_native (lag + builtin median) must be row-for-row
    equal to the applyInPandas demonstrator on real data."""
    events = load_table(spark, SF_DIR, "events")
    native = {
        r.entity: (r.n_gaps, r.median_gap_s)
        for r in median_gap_native(events, "user_id", "ts").collect()
    }
    pandas_ = {
        r.entity: (r.n_gaps, r.median_gap_s)
        for r in exact_median_gap(events, "user_id", "ts").collect()
    }
    assert set(native) == set(pandas_)
    for entity in native:
        assert native[entity][0] == pandas_[entity][0]
        assert native[entity][1] == pytest.approx(pandas_[entity][1], abs=0.0)


def test_native_median_plan_has_no_python(spark):
    """The driver-query plan must stay JVM-side: no Arrow/pandas eval."""
    events = load_table(spark, SF_DIR, "events")
    plan = (
        median_gap_native(events, "user_id", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_single_entity_edge_cases(spark):
    """Entities with <2 events are omitted; even gap counts average the
    two middle values (both engines and both operators agree)."""
    rows = [
        (1, "2024-01-01 00:00:00"),  # single event -> omitted
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:00:10"),
        (2, "2024-01-01 00:00:30"),
        (2, "2024-01-01 00:01:30"),  # gaps 10,20,60 -> median 20
        (3, "2024-01-01 00:00:00"),
        (3, "2024-01-01 00:00:10"),
        (3, "2024-01-01 00:00:40"),  # gaps 10,30 -> median 20.0 (avg)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    for op in (median_gap_native, exact_median_gap):
        got = {r.entity: (r.n_gaps, r.median_gap_s) for r in op(df).collect()}
        assert set(got) == {2, 3}, op.__name__
        assert got[2] == (3, 20.0), op.__name__
        assert got[3] == (2, 20.0), op.__name__


class TestHistogramQuantiles:
    def test_estimates_within_one_bucket_of_exact(self, spark):
        from yandex_tracker_exporter_spark.operators.grouped import (
            histogram_quantiles,
        )

        import numpy as np

        rng = np.random.RandomState(5)
        vals = rng.uniform(0.0, 100.0, size=2000)
        df = spark.createDataFrame(
            [("g", float(v)) for v in vals], "g string, value double"
        )
        out = histogram_quantiles(
            df, "value", "g", lo=0.0, hi=100.0, num_buckets=1000
        ).collect()[0]
        width = 100.0 / 1000
        assert out.n == 2000
        for q, est in ((0.5, out.p50), (0.95, out.p95), (0.99, out.p99)):
            exact = float(np.quantile(vals, q, method="inverted_cdf"))
            assert abs(est - exact) <= 2 * width, (q, est, exact)

    def test_out_of_domain_values_clamp_to_edge_buckets(self, spark):
        from yandex_tracker_exporter_spark.operators.grouped import (
            histogram_quantiles,
        )

        df = spark.createDataFrame(
            [("g", -50.0), ("g", 0.5), ("g", 999.0)], "g string, value double"
        )
        out = histogram_quantiles(
            df, "value", "g", lo=0.0, hi=1.0, num_buckets=10
        ).collect()[0]
        assert out.n == 3
        # p99 lands in the clamped top bucket: lower edge 0.9
        assert out.p99 == 0.9

    def test_rejects_empty_domain(self, spark):
        import pytest as _pytest

        from yandex_tracker_exporter_spark.operators.grouped import (
            histogram_quantiles,
        )

        df = spark.createDataFrame([("g", 1.0)], "g string, value double")
        with _pytest.raises(ValueError):
            histogram_quantiles(df, "value", "g", lo=1.0, hi=1.0)


def test_histogram_quantiles_ignores_null_and_nan(spark):
    from yandex_tracker_exporter_spark.operators.grouped import (
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [("g", 1.0), ("g", float("nan")), ("g", None), ("g", 3.0)],
        "g string, value double",
    )
    out = histogram_quantiles(df, "value", "g", lo=0.0, hi=4.0).collect()[0]
    assert out.n == 2  # only the two real values counted


def test_quantile_labels_decimal_exact(spark):
    """p99.9 must not collide with p99, and 0.29 must not truncate to
    p28 via float artifacts."""
    from yandex_tracker_exporter_spark.operators.grouped import (
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 2001)], "grp string, v double"
    )
    out = histogram_quantiles(
        df, "v", "grp", 0.0, 2000.0, quantiles=(0.29, 0.99, 0.999),
        num_buckets=2000,
    )
    assert [c for c in out.columns if c.startswith("p")] == [
        "p29", "p99", "p99_9"
    ]
    row = out.collect()[0]
    assert row["p99"] != row["p99_9"]
