"""ClickHouse-compatibility export edge (F9/P13/S5/S9).

The engine keeps Spark-native semantics internally (real nulls, real
timestamps); the reference's ClickHouse-isms are applied ONLY at this
export boundary:

- ``apply_ch_compat`` — F9 null-date scrub (the reference deletes
  null/empty date keys so ClickHouse ``DEFAULT 0`` fills epoch-0,
  ``helpers.py:76-87`` + field list ``config.py:202-214``) and P13's
  ``None → ""`` for strings (``models/base.py:78-81``).
- ``issues_ddl`` / ``issue_metrics_ddl`` / ``issues_changelog_ddl`` —
  S9 destination DDL equivalent to ``migrations/clickhouse/000001..4``
  (ReplacingMergeTree + monthly partitioning + ORDER BY dedup key),
  emitted as SQL strings for an external ClickHouse.
- ``write_jdbc`` — S5 batch insert via the generic JDBC writer (driver
  jar not bundled here; the call site is the integration point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, StringType, TimestampType

from yandex_tracker_exporter_spark.config import DEFAULT_CONFIG, EngineConfig

#: ClickHouse epoch-0 stand-ins for scrubbed null dates.
EPOCH_TS = "1970-01-01 00:00:00"
EPOCH_DATE = "1970-01-01"


def apply_ch_compat(df: DataFrame, config: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Rewrite nulls the way the reference's sink expects.

    Date/timestamp columns in the not-nullable list become epoch 0
    (the effect of deleting the key + ``DEFAULT 0``); strings become
    ``""``; arrays become ``[]``. Numeric/boolean nulls are 0/false in
    ClickHouse defaults and are coalesced likewise.
    """
    out = df
    not_nullable = set(config.not_nullable_fields)
    for field in df.schema.fields:
        col = F.col(field.name)
        if field.name in not_nullable and isinstance(field.dataType, TimestampType):
            out = out.withColumn(
                field.name, F.coalesce(col, F.lit(EPOCH_TS).cast("timestamp"))
            )
        elif field.name in not_nullable and isinstance(field.dataType, DateType):
            out = out.withColumn(
                field.name, F.coalesce(col, F.lit(EPOCH_DATE).cast("date"))
            )
        elif isinstance(field.dataType, StringType):
            out = out.withColumn(field.name, F.coalesce(col, F.lit("")))
        elif field.dataType.typeName() == "array":
            out = out.withColumn(
                field.name, F.coalesce(col, F.array().cast(field.dataType))
            )
        elif field.dataType.typeName() in ("long", "integer", "float", "double"):
            out = out.withColumn(
                field.name, F.coalesce(col, F.lit(0).cast(field.dataType))
            )
        elif field.dataType.typeName() == "boolean":
            out = out.withColumn(field.name, F.coalesce(col, F.lit(False)))
    return out


def format_for_display(
    df: DataFrame, config: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """P4 second half: serialize timestamp/date columns as strings in the
    configured display timezone (``EngineConfig.timezone``, default
    Europe/Moscow — reference ``config.py:114``). The reference converts
    every outbound datetime this way in its serializer
    (``helpers.py:120-146``); internally the engine stays UTC and this
    runs only at the export edge. Date columns render ISO ``yyyy-MM-dd``
    (NOT the reference's ``%Y-%d-%m`` bug)."""
    from yandex_tracker_exporter_spark.functions.datetimes import (
        format_display_datetime,
    )

    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampType):
            out = out.withColumn(
                field.name,
                format_display_datetime(F.col(field.name), config.timezone),
            )
        elif isinstance(field.dataType, DateType):
            out = out.withColumn(
                field.name, F.date_format(F.col(field.name), "yyyy-MM-dd")
            )
    return out


def issues_ddl(database: str = "agile") -> str:
    """S9 parity with ``000001_create_table_issues.up.sql``."""
    return f"""CREATE TABLE IF NOT EXISTS {database}.issues (
  version DateTime64(3, 'UTC') DEFAULT now64(3),
  queue LowCardinality(String), title String, issue_key String,
  issue_type LowCardinality(String), priority LowCardinality(String),
  status LowCardinality(String), resolution LowCardinality(String),
  assignee String, author String, qa_engineer String,
  tags Array(String), components Array(String),
  project LowCardinality(String),
  created_at DateTime64(3, 'UTC') DEFAULT 0,
  updated_at DateTime64(3, 'UTC') DEFAULT 0,
  deadline Date DEFAULT 0,
  closed_at DateTime64(3, 'UTC') DEFAULT 0,
  resolved_at DateTime64(3, 'UTC') DEFAULT 0,
  start_date Date DEFAULT 0, end_date Date DEFAULT 0,
  is_subtask UInt8, is_closed UInt8, is_resolved UInt8,
  story_points Float32 DEFAULT 0,
  sprints Array(String), parent_issue_key String, epic_issue_key String,
  aliases Array(String), was_moved UInt8,
  moved_at DateTime64(3, 'UTC') DEFAULT 0, moved_by String
) ENGINE = ReplacingMergeTree(version)
PARTITION BY toYYYYMM(updated_at)
ORDER BY issue_key"""


def issue_metrics_ddl(database: str = "agile") -> str:
    """S9 parity with ``000002…up.sql`` (counters widened: UInt8 →
    UInt32 — the reference's 255-transition overflow is a recorded bug)."""
    return f"""CREATE TABLE IF NOT EXISTS {database}.issue_metrics (
  version DateTime64(3, 'UTC') DEFAULT now64(3),
  last_seen DateTime64(3, 'UTC') DEFAULT 0,
  issue_key String, status_name LowCardinality(String),
  status_transitions_count UInt32, duration UInt64,
  human_readable_duration String,
  busdays_duration UInt64, human_readable_busdays_duration String
) ENGINE = ReplacingMergeTree(version)
PARTITION BY toYYYYMM(last_seen)
ORDER BY (issue_key, status_name, last_seen)"""


def issues_changelog_ddl(database: str = "agile") -> str:
    """S9 parity with ``000003…up.sql``."""
    return f"""CREATE TABLE IF NOT EXISTS {database}.issues_changelog (
  version DateTime64(3, 'UTC') DEFAULT now64(3),
  event_time DateTime64(3, 'UTC') DEFAULT 0,
  issue_key String, queue LowCardinality(String),
  event_type LowCardinality(String), transport LowCardinality(String),
  actor String, changed_field String, changed_from String, changed_to String
) ENGINE = ReplacingMergeTree(version)
PARTITION BY toYYYYMM(event_time)
ORDER BY (issue_key, event_time, event_type, changed_field)"""


def latest_view_ddl(table: str, database: str = "agile") -> str:
    """S9 parity with ``000004_create_view_issues_view.up.sql``."""
    return (
        f"CREATE VIEW IF NOT EXISTS {database}.{table}_view AS "
        f"SELECT * FROM {database}.{table} FINAL"
    )


def with_retries(
    fn,
    exceptions: tuple[type[Exception], ...] = (Exception,),
    base_delay: float = 0.5,
    expo_factor: float = 2.5,
    max_tries: int = 3,
    sleep=None,
):
    """Bounded exponential-backoff retry (reference
    ``utils/helpers.py:149-186`` ``backoff`` decorator, functional form:
    delay starts at ``base_delay`` and multiplies by ``expo_factor``
    per failure; the last failure re-raises). ``sleep`` is injectable
    for tests."""
    import time as _time

    if max_tries < 1:
        # range(1, 1) would skip fn entirely and silently return None —
        # a caller intending "no retries" means ONE try, not zero
        raise ValueError(f"max_tries must be >= 1, got {max_tries}")
    do_sleep = sleep if sleep is not None else _time.sleep
    delay = base_delay
    for attempt in range(1, max_tries + 1):
        try:
            return fn()
        except exceptions:
            if attempt == max_tries:
                raise
            do_sleep(delay)
            delay *= expo_factor


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str = "default",
    password: str = "",
    batch_size: int = 10_000,
    sort_keys: list[str] | None = None,
    max_tries: int = 3,
    base_delay: float = 0.5,
    writer=None,
) -> None:
    """S5 batch insert: JDBC append, sorted by the table's ORDER BY key
    (the reference's TODO at ``clickhouse.py:109`` — pre-sorted inserts
    merge cheaper in MergeTree), with the reference's bounded
    exponential-backoff retry around the insert
    (``utils/helpers.py:149-186``; the reference wraps ``execute`` and
    ``insert_batch`` in ``@backoff``).

    Requires the ClickHouse JDBC driver on the classpath; this is the
    single integration point for a live warehouse. ``writer`` overrides
    the actual save call (tests inject failures); retries re-run the
    whole idempotent-append attempt.
    """
    out = df.sortWithinPartitions(*sort_keys) if sort_keys else df

    def _save() -> None:
        (
            out.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("user", user)
            .option("password", password)
            .option("batchsize", batch_size)
            .option("isolationLevel", "NONE")
            .mode("append")
            .save()
        )

    with_retries(
        writer if writer is not None else _save,
        max_tries=max_tries,
        base_delay=base_delay,
    )
