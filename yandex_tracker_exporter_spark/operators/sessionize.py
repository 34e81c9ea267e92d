"""Status-time sessionization — the reference's core analytic (A1).

The reference accumulates per-(issue, status) time in a Python dict while
looping over each issue's changelog (``models/issue.py:169-224``). Here it
is one shuffle: filter → interval columns → ``groupBy(key, status)``.

Two variants:

- ``status_metrics`` — Tracker-shaped: workflow events carry both interval
  endpoints in ``fields[1]`` (from/to), so no window function is needed at
  all; the initial-status transition falls back to ``createdAt``
  (``issue.py:185``), corrupt events (null end) are dropped
  (``issue.py:188-194``), and the still-open current status is *not*
  emitted (``issue.py:226-241``).

- ``sessionize_events`` — generic event-stream shaped (the harness
  ``events`` table): intervals are reconstructed with ``lead() over
  (partitionBy(entity).orderBy(ts))`` — the SURVEY A1 fallback path. The
  final open interval per entity has no end and is excluded, mirroring
  "current status not counted".

Scale notes: the window and the aggregation share the same partitioning
key (entity), so AQE plans a single shuffle on entity; the aggregation
is a partial-agg-friendly hash agg. Skewed entities are handled by AQE
skew-split since each entity's event list is processed as a sorted run,
not materialized per-group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.config import DEFAULT_CONFIG, EngineConfig
from yandex_tracker_exporter_spark.functions.business import business_seconds
from yandex_tracker_exporter_spark.functions.datetimes import (
    parse_tracker_datetime,
    to_human_time,
)
from yandex_tracker_exporter_spark.functions.text import to_snake_case


def sessionize_events(
    events: DataFrame,
    entity_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(entity, state) dwell-time metrics from a raw event stream.

    Each event opens a state session that closes at the entity's next
    event; the last (still open) session is excluded — the analogue of
    the reference never counting the current status.

    Output: entity, state_name, status_transitions_count, duration (sum
    of session seconds), last_seen (max session end).
    """
    # NB: aggregate on the ORIGINAL column names and alias only at the
    # end — renaming before the window hides the alias equivalence from
    # Spark's partitioning propagation and costs a second shuffle (the
    # window's hashpartitioning(entity) already satisfies the groupBy's
    # (entity, state) clustered distribution).
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col).asc(), F.col(state_col).asc())
    sessions = events.select(
        entity_col,
        state_col,
        F.col(ts_col).alias("_session_start"),
        F.lead(F.col(ts_col)).over(w).alias("_session_end"),
    ).where(F.col("_session_end").isNotNull())
    out = sessions.groupBy(entity_col, state_col).agg(
        F.count(F.lit(1)).alias("status_transitions_count"),
        F.sum(
            F.unix_timestamp("_session_end") - F.unix_timestamp("_session_start")
        ).alias("duration"),
        F.max("_session_end").alias("last_seen"),
    )
    return out.select(
        F.col(entity_col).alias("entity"),
        F.col(state_col).alias("state_name"),
        "status_transitions_count",
        "duration",
        "last_seen",
    )


def _status_transition_events(
    changelog: DataFrame, config: EngineConfig
) -> DataFrame:
    """F6+F7+F8: keep workflow status transitions with a valid interval."""
    return (
        changelog.where(F.col("type") == config.workflow_event_type)  # F6
        .where(F.size("fields") >= 2)  # F7
        .where(F.col("fields")[0]["field"]["id"] == "status")  # F7
    )


def status_metrics(
    changelog: DataFrame,
    issues: DataFrame | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
    include_busdays: bool = True,
) -> DataFrame:
    """Tracker-parity per-(issue, status) cycle-time metrics (A1).

    ``changelog`` follows RAW_CHANGELOG_SCHEMA; ``issues`` (optional)
    provides ``createdAt`` for the initial-status fallback — joined
    broadcast since it is only (key, createdAt).

    Output matches ISSUE_METRICS_SCHEMA minus ``version`` (added at the
    sink): issue_key, status_name, status_transitions_count, duration,
    human_readable_duration, busdays_duration,
    human_readable_busdays_duration, last_seen.
    """
    transitions = _status_transition_events(changelog, config)

    if issues is not None:
        created = F.broadcast(
            issues.select(
                F.col("key").alias("issue_key"),
                parse_tracker_datetime("createdAt").alias("_created_at"),
            )
        )
        transitions = transitions.join(created, "issue_key", "left")
    else:
        transitions = transitions.withColumn(
            "_created_at", F.lit(None).cast("timestamp")
        )

    start_raw = F.col("fields")[1]["from"]
    end_raw = F.col("fields")[1]["to"]
    intervals = (
        transitions.select(
            "issue_key",
            to_snake_case(F.lower(F.col("fields")[0]["from"])).alias("status_name"),
            # initial-status transition: fields[1].from is null → createdAt
            F.coalesce(parse_tracker_datetime(start_raw), F.col("_created_at")).alias(
                "start_ts"
            ),
            parse_tracker_datetime(end_raw).alias("end_ts"),
        )
        # F8: drop corrupt events with no usable interval
        .where(F.col("start_ts").isNotNull() & F.col("end_ts").isNotNull())
    )

    duration = F.abs(
        F.unix_timestamp("end_ts") - F.unix_timestamp("start_ts")
    ).cast("long")
    busdays = (
        business_seconds(
            "start_ts",
            "end_ts",
            workdays=config.workdays,
            hour_start=config.business_hour_start,
            hour_end=config.business_hour_end,
            holiday_dates=config.holiday_dates,
        )
        if include_busdays
        else F.lit(0).cast("long")
    )

    per_status = (
        intervals.withColumn("_duration", duration)
        .withColumn("_busdays", busdays)
        .groupBy("issue_key", "status_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("status_transitions_count"),
            F.sum("_duration").alias("duration"),
            F.sum("_busdays").alias("busdays_duration"),
            F.max("end_ts").alias("last_seen"),
        )
    )
    return per_status.select(
        "issue_key",
        "status_name",
        "status_transitions_count",
        "duration",
        to_human_time("duration").alias("human_readable_duration"),
        "busdays_duration",
        to_human_time("busdays_duration").alias("human_readable_busdays_duration"),
        "last_seen",
    )


def corrupt_transition_events(
    changelog: DataFrame,
    *,
    issues: DataFrame | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """F8 quarantine: EXACTLY the workflow status-transition events that
    ``status_metrics`` drops — routed to a DataFrame instead of log
    lines so bad data is queryable, not lost (SURVEY F8 mapping).

    Pass the same ``issues`` given to ``status_metrics``: the keep rule
    is ``coalesce(parse(from), createdAt) IS NOT NULL AND parse(to) IS
    NOT NULL``, so the quarantine predicate is its exact complement —
    a null/unparseable ``from`` is only corrupt when no createdAt
    fallback exists, and an unparseable ``to`` is always corrupt.
    Metrics + quarantine partition the transition stream: every
    transition lands in exactly one of the two outputs."""
    transitions = _status_transition_events(changelog, config)
    if issues is not None:
        created = F.broadcast(
            issues.select(
                F.col("key").alias("issue_key"),
                parse_tracker_datetime("createdAt").alias("_created_at"),
            )
        )
        transitions = transitions.join(created, "issue_key", "left")
    else:
        transitions = transitions.withColumn(
            "_created_at", F.lit(None).cast("timestamp")
        )
    start_raw = F.col("fields")[1]["from"]
    end_raw = F.col("fields")[1]["to"]
    return transitions.where(
        parse_tracker_datetime(end_raw).isNull()
        | (
            parse_tracker_datetime(start_raw).isNull()
            & F.col("_created_at").isNull()
        )
    ).drop("_created_at")


def closed_at_refinement(
    changelog: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Latest transition INTO a closed status, per issue — the
    changelog half of the two-path closed_at definition
    (``issue.py:203-210``). Returns (issue_key, closed_at_candidate)
    to left-join onto issues.

    The other half — only apply the candidate while the issue
    CURRENTLY sits in a closed status, and prefer resolved_at for
    resolved issues — needs the flattened issue row and lives in the
    caller (``etl._apply_closed_at_refinement``); joining these
    candidates without that gate would set closed_at on issues that
    were later reopened.
    """
    transitions = _status_transition_events(changelog, config)
    closed = tuple(config.closed_statuses)
    candidates = (
        transitions.select(
            "issue_key",
            to_snake_case(F.lower(F.col("fields")[0]["to"])).alias("_to_status"),
            parse_tracker_datetime(F.col("fields")[1]["to"]).alias("_end_ts"),
        )
        .where(F.col("_to_status").isin(*closed) & F.col("_end_ts").isNotNull())
        .groupBy("issue_key")
        .agg(F.max("_end_ts").alias("closed_at_candidate"))
    )
    return candidates
