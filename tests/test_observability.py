"""U3/A3 observed run counters + F8 quarantine routing."""

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.etl import transform_issues
from yandex_tracker_exporter_spark.observability import (
    MetricsCollector,
    with_run_counters,
)
from yandex_tracker_exporter_spark.operators.sessionize import (
    corrupt_transition_events,
    status_metrics,
)


def test_observed_counters_no_extra_pass(spark, raw_issues, raw_changelog):
    flat = transform_issues(raw_issues, raw_changelog)
    observed, obs = with_run_counters(flat)
    n = observed.count()  # ONE action computes rows AND metrics
    metrics = obs.get
    assert metrics["n_rows"] == n == 3
    assert metrics["null_keys"] == 0
    assert metrics["max_updated_at"] is not None

    collector = MetricsCollector(spark)
    entry = collector.record(obs, tags={"table": "issues"})
    assert entry["table"] == "issues" and entry["n_rows"] == 3


def test_corrupt_events_quarantined_not_lost(spark, raw_issues, raw_changelog):
    quarantine = corrupt_transition_events(raw_changelog)
    rows = quarantine.collect()
    # exactly the one corrupted event (null end time) from the fixture
    assert len(rows) == 1
    assert rows[0]["issue_key"] == "TEST-1"
    assert rows[0]["fields"][1]["to"] is None

    # metrics + quarantine partition the transition stream: nothing lost
    metrics = status_metrics(raw_changelog, raw_issues)
    total_transitions = (
        raw_changelog.where(F.col("type") == "IssueWorkflow")
        .where(F.size("fields") >= 2)
        .where(F.col("fields")[0]["field"]["id"] == "status")
        .count()
    )
    kept = metrics.agg(F.sum("status_transitions_count")).collect()[0][0]
    assert kept + len(rows) == total_transitions
