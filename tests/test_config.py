"""Env-driven config (reference parity: pydantic-settings EXPORTER_* vars,
config.py:179-244). A container whose environment configures the reference
must configure this engine identically — and the values must reach query
semantics, not just the dataclass.
"""

import datetime as dt

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.config import (
    DEFAULT_CONFIG,
    EngineConfig,
    env_state_store_settings,
)
from yandex_tracker_exporter_spark.etl import transform_issues
from yandex_tracker_exporter_spark.functions.business import business_seconds


def test_from_env_reads_reference_variable_names():
    cfg = EngineConfig.from_env(
        env={
            "EXPORTER_CLOSED_ISSUE_STATUSES": "done,wontfix",
            "EXPORTER_WORKDAYS": "[0,1,2,3,4,5]",
            "EXPORTER_BUSINESS_HOURS_START": "08:30",
            "EXPORTER_BUSINESS_HOURS_END": "20",
            "EXPORTER_TRACKER__TIMEZONE": "Asia/Tokyo",
            "EXPORTER_NOT_NULLABLE_FIELDS": "created_at,deadline",
            "EXPORTER_TRACKER__SEARCH__RANGE": "6h",
            "EXPORTER_STATEFUL_INITIAL_RANGE": "3mo",
            "EXPORTER_HOLIDAY_DATES": "2024-01-01,2024-05-01",
            "EXPORTER_SOMETHING_UNKNOWN": "ignored",  # extra = ignore
        }
    )
    assert cfg.closed_statuses == ("done", "wontfix")
    assert cfg.workdays == (0, 1, 2, 3, 4, 5)
    assert cfg.business_hour_start == 8  # pydantic time "08:30" → hour
    assert cfg.business_hour_end == 20
    assert cfg.timezone == "Asia/Tokyo"
    assert cfg.not_nullable_fields == ("created_at", "deadline")
    assert cfg.search_range == "6h"
    assert cfg.stateful_initial_range == "3mo"
    assert cfg.holiday_dates == ("2024-01-01", "2024-05-01")


def test_from_env_defaults_and_csv_workdays():
    assert EngineConfig.from_env(env={}) == DEFAULT_CONFIG
    cfg = EngineConfig.from_env(env={"EXPORTER_WORKDAYS": "0,1,2"})
    assert cfg.workdays == (0, 1, 2)
    # case-insensitive names, like pydantic-settings
    cfg = EngineConfig.from_env(env={"exporter_tracker__timezone": "UTC"})
    assert cfg.timezone == "UTC"


def test_from_env_reads_process_environment(monkeypatch):
    monkeypatch.setenv("EXPORTER_CLOSED_ISSUE_STATUSES", "archived")
    assert EngineConfig.from_env().closed_statuses == ("archived",)


def test_env_state_store_settings():
    s = env_state_store_settings(env={})
    assert s == {"strategy": "local", "path": "state.json", "url": None}
    s = env_state_store_settings(
        env={
            "EXPORTER_STATE__STORAGE": "jsonfile",
            "EXPORTER_STATE__JSONFILE_STRATEGY": "s3",
            "EXPORTER_STATE__JSONFILE_PATH": "s3a://bucket/wm.json",
        }
    )
    assert s == {"strategy": "s3", "path": "s3a://bucket/wm.json", "url": None}
    s = env_state_store_settings(
        env={
            "EXPORTER_STATE__STORAGE": "redis",
            "EXPORTER_STATE__REDIS_DSN": "redis://cache:6379/1",
        }
    )
    assert s == {"strategy": "redis", "path": None, "url": "redis://cache:6379/1"}


def test_env_closed_statuses_propagate_into_is_closed(spark, raw_issues):
    """DEV-1 is status=open — not closed under defaults; an env config
    declaring 'open' a closed status must flip its is_closed flag."""
    cfg = EngineConfig.from_env(
        env={"EXPORTER_CLOSED_ISSUE_STATUSES": "open,closed"}
    )
    flags = {
        r.issue_key: r.is_closed
        for r in transform_issues(raw_issues, config=cfg).collect()
    }
    assert flags["DEV-1"] is True
    default_flags = {
        r.issue_key: r.is_closed
        for r in transform_issues(raw_issues, config=DEFAULT_CONFIG).collect()
    }
    assert default_flags["DEV-1"] is False


def test_env_business_hours_propagate_into_duration(spark):
    """A Monday 10:00→23:00 interval is 12h under the default 09-22
    window but 5h under an env-configured 10-15 window."""
    cfg = EngineConfig.from_env(
        env={
            "EXPORTER_BUSINESS_HOURS_START": "10",
            "EXPORTER_BUSINESS_HOURS_END": "15:00",
        }
    )
    df = spark.createDataFrame(
        [(dt.datetime(2023, 10, 16, 10, 0), dt.datetime(2023, 10, 16, 23, 0))],
        "s timestamp, e timestamp",
    )
    col = business_seconds(
        "s",
        "e",
        workdays=cfg.workdays,
        hour_start=cfg.business_hour_start,
        hour_end=cfg.business_hour_end,
        holiday_dates=cfg.holiday_dates,
    )
    assert df.select(col).collect()[0][0] == 5 * 3600


def test_env_timezone_propagates_into_display_formatting(spark):
    """format_display_datetime must honor the env-configured tz."""
    from yandex_tracker_exporter_spark.functions.datetimes import (
        format_display_datetime,
    )

    cfg = EngineConfig.from_env(env={"EXPORTER_TRACKER__TIMEZONE": "Asia/Tokyo"})
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0),)], "ts timestamp"
    )
    shown = df.select(
        format_display_datetime(F.col("ts"), cfg.timezone).alias("s")
    ).collect()[0][0]
    assert shown.startswith("2024-01-01T09:00")  # UTC+9
