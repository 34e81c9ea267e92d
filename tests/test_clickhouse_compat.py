"""F9/P13 export-edge semantics (null-date scrub + None→"")."""

import datetime as dt

from yandex_tracker_exporter_spark.etl import transform_issues
from yandex_tracker_exporter_spark.sources.clickhouse_compat import (
    apply_ch_compat,
    issues_ddl,
    issue_metrics_ddl,
    issues_changelog_ddl,
    latest_view_ddl,
)


def test_apply_ch_compat_nulls(spark, raw_issues, raw_changelog):
    flat = transform_issues(raw_issues, raw_changelog)
    compat = apply_ch_compat(flat)
    rows = {r["issue_key"]: r for r in compat.collect()}

    d1 = rows["DEV-1"]
    # F9: null dates in the not-nullable list → epoch 0
    assert d1["closed_at"] == dt.datetime(1970, 1, 1)
    assert d1["resolved_at"] == dt.datetime(1970, 1, 1)
    assert d1["deadline"] == dt.date(1970, 1, 1)
    # P13: null strings → ""
    assert d1["qa_engineer"] == ""
    assert d1["resolution"] == ""
    # non-null values untouched
    assert d1["assignee"] == "dev2@example.com"
    assert rows["TEST-1"]["closed_at"] == dt.datetime(2023, 5, 1, 17, 0)
    # nothing nullable remains in scrubbed columns
    assert compat.where(compat.closed_at.isNull()).count() == 0


def test_ddl_parity_shapes():
    ddl = issues_ddl()
    assert "ReplacingMergeTree(version)" in ddl
    assert "PARTITION BY toYYYYMM(updated_at)" in ddl
    assert "ORDER BY issue_key" in ddl
    ddl = issue_metrics_ddl()
    assert "ORDER BY (issue_key, status_name, last_seen)" in ddl
    assert "UInt32" in ddl  # widened vs the reference's UInt8 overflow bug
    ddl = issues_changelog_ddl()
    assert "ORDER BY (issue_key, event_time, event_type, changed_field)" in ddl
    assert latest_view_ddl("issues").endswith("FROM agile.issues FINAL")
