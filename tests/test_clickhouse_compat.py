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


def test_write_jdbc_retries_with_backoff(spark):
    """Transient sink failures retry with exponential backoff (reference
    helpers.py backoff parity); permanent failures re-raise after
    max_tries."""
    from yandex_tracker_exporter_spark.sources.clickhouse_compat import (
        with_retries,
        write_jdbc,
    )

    df = spark.createDataFrame([("A", 1)], "k string, v long")

    calls, delays = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("connection reset")

    # succeed on the 3rd attempt; two backoff sleeps 0.5, 1.25
    with_retries(flaky, base_delay=0.5, expo_factor=2.5, max_tries=3,
                 sleep=delays.append)
    assert len(calls) == 3
    assert delays == [0.5, 1.25]

    # write_jdbc wires the retry around the (injected) writer
    calls.clear()

    def always_fails():
        calls.append(1)
        raise RuntimeError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        write_jdbc(df, "jdbc:clickhouse://x", "t", writer=always_fails,
                   max_tries=3, base_delay=0.0)
    assert len(calls) == 3


def test_with_retries_rejects_zero_tries():
    """max_tries < 1 must raise, not silently skip fn and return None
    (a caller intending 'no retries' means one try, not zero)."""
    import pytest

    from yandex_tracker_exporter_spark.sources.clickhouse_compat import (
        with_retries,
    )

    calls = []
    with pytest.raises(ValueError, match="max_tries"):
        with_retries(lambda: calls.append(1), max_tries=0)
    assert calls == []
    assert with_retries(lambda: 42, max_tries=1) == 42
