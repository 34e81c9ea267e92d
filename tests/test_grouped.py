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
