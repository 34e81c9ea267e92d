"""A1 sessionization golden tests — the README.md:106-130 walkthrough
(FIXTURES.md §4) plus the generic event-stream variant.
"""

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.sessionize import (
    sessionize_events,
    status_metrics,
)


def test_status_metrics_readme_walkthrough(spark, raw_issues, raw_changelog):
    metrics = status_metrics(raw_changelog, raw_issues).orderBy(
        "issue_key", "status_name"
    )
    rows = {
        (r["issue_key"], r["status_name"]): r for r in metrics.collect()
    }

    # Open → In progress → Testing → In progress → Testing →
    # Ready for release → Closed. Expected rows: open×1, in_progress×2,
    # testing×2, ready_for_release×1; NO row for the terminal status
    # (current status never counted) and none for the corrupted event.
    assert set(rows) == {
        ("TEST-1", "open"),
        ("TEST-1", "in_progress"),
        ("TEST-1", "testing"),
        ("TEST-1", "ready_for_release"),
    }

    # open: createdAt fallback 09:00 → 10:00 = 1h (issue.py:185)
    open_row = rows[("TEST-1", "open")]
    assert open_row["status_transitions_count"] == 1
    assert open_row["duration"] == 3600
    assert open_row["human_readable_duration"] == "1h"

    # in_progress: (10→12) + (13→15) = 4h across 2 transitions (additive
    # accumulation on revisit, issue.py:212-215)
    ip = rows[("TEST-1", "in_progress")]
    assert ip["status_transitions_count"] == 2
    assert ip["duration"] == 4 * 3600

    # testing: (12→13) + (15→16) = 2h
    t = rows[("TEST-1", "testing")]
    assert t["status_transitions_count"] == 2
    assert t["duration"] == 2 * 3600

    # ready_for_release: 16→17 = 1h
    rfr = rows[("TEST-1", "ready_for_release")]
    assert rfr["status_transitions_count"] == 1
    assert rfr["duration"] == 3600
    assert rfr["last_seen"].isoformat().startswith("2023-05-01T17:00:00")

    # busdays: 2023-05-01 is a Monday, all intervals inside 09-22 window
    assert ip["busdays_duration"] == 4 * 3600
    assert ip["human_readable_busdays_duration"] == "4h"


def test_sessionize_events_excludes_open_session(spark):
    rows = [
        (1, "a", "2024-01-01 10:00:00"),
        (1, "b", "2024-01-01 11:00:00"),
        (1, "a", "2024-01-01 13:00:00"),  # open session — excluded
        (2, "a", "2024-01-01 09:00:00"),  # single event → no closed session
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["entity"], r["state_name"]): r
        for r in sessionize_events(events).collect()
    }
    assert set(got) == {(1, "a"), (1, "b")}
    assert got[(1, "a")]["duration"] == 3600
    assert got[(1, "b")]["duration"] == 2 * 3600
    assert got[(1, "a")]["status_transitions_count"] == 1
