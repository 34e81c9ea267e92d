"""End-to-end issue ETL (SURVEY §3) — the reference's pipeline, Spark-first.

The reference loops issues one at a time (``etl.py:127-191``), hydrating
attributes over HTTP and accumulating Python dicts. Here the whole run is
three declarative DataFrames built from two inputs (raw issues + raw
changelog, schemas in ``schemas.py``):

- ``transform_issues``    — the wide ~30-column projection
  (``TrackerIssue._transform``, ``models/issue.py:74-107``) as one
  ``select`` of column expressions (P1-P5, P10-P11), plus the
  changelog-derived moved-event (P12) and closed_at refinement
  (``issue.py:203-210``) as two small left joins.
- ``transform_changelog`` — the event-log flattening
  (``_convert_and_save_changelog``, ``issue.py:126-160``): explode
  fields, P9-normalize the polymorphic values, drop corrupt rows (F8).
- ``status_metrics``      — per-(issue,status) cycle times (A1), in
  ``operators/sessionize.py``.

``run_etl`` wires them with the incremental search spec (F1), watermark
state (S8/ST2/ST7) and versioned sinks (O1/O2) — the full reference
lifecycle (``etl.py:203-264``) as one idempotent batch.

Extension surface (U1, ``examples/extended_model/main.py:8-31``): pass
``extra_columns={name: Column}`` — appended to the projection exactly
like a ``TrackerIssue`` subclass adds attributes.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.config import DEFAULT_CONFIG, EngineConfig
from yandex_tracker_exporter_spark.functions.changelog import extract_changelog_value
from yandex_tracker_exporter_spark.functions.datetimes import parse_tracker_datetime
from yandex_tracker_exporter_spark.functions.text import string_normalize, to_snake_case
from yandex_tracker_exporter_spark.operators.sessionize import (
    closed_at_refinement,
    status_metrics,
)
from yandex_tracker_exporter_spark.operators.watermark import (
    compute_watermark,
    is_up_to_date,
)
from yandex_tracker_exporter_spark.plans.search_spec import SearchSpec, apply_search
from yandex_tracker_exporter_spark.schemas import DEDUP_KEYS
from yandex_tracker_exporter_spark.sources.sinks import write_versioned
from yandex_tracker_exporter_spark.sources.state import FileStateStore


def _low(c: Column) -> Column:
    """P1's lowercase-on-extract semantic (``validate_resource`` low=True)."""
    return F.lower(c)


def transform_issues(
    raw_issues: DataFrame,
    raw_changelog: DataFrame | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
    extra_columns: dict[str, Column] | None = None,
) -> DataFrame:
    """RAW_ISSUE_SCHEMA → ISSUES_SCHEMA wide projection (minus version).

    Every per-row Python getattr walk in the reference becomes a struct
    field access; missing structs yield null automatically (P1).
    """
    resolution = to_snake_case(_low(F.col("resolution.name")))
    status = to_snake_case(_low(F.col("status.name")))
    is_resolved = resolution.isNotNull()
    is_closed = status.isin(*config.closed_statuses) | is_resolved
    resolved_at = parse_tracker_datetime("resolvedAt")

    flat = raw_issues.select(
        F.col("queue.key").alias("queue"),
        F.col("key").alias("issue_key"),
        string_normalize(F.col("summary")).alias("title"),
        to_snake_case(_low(F.col("type.name"))).alias("issue_type"),
        _low(F.col("priority.name")).alias("priority"),
        _low(F.col("assignee.email")).alias("assignee"),
        _low(F.col("createdBy.email")).alias("author"),
        status.alias("status"),
        resolution.alias("resolution"),
        F.coalesce(F.col("tags"), F.array().cast("array<string>")).alias("tags"),
        F.coalesce(
            F.transform(F.col("components"), lambda c: c["name"]),
            F.array().cast("array<string>"),
        ).alias("components"),
        is_resolved.alias("is_resolved"),
        is_closed.alias("is_closed"),
        parse_tracker_datetime("createdAt").alias("created_at"),
        parse_tracker_datetime("updatedAt").alias("updated_at"),
        resolved_at.alias("resolved_at"),
        F.when(is_resolved, resolved_at).alias("closed_at"),
        F.col("start").cast("date").alias("start_date"),
        F.col("end").cast("date").alias("end_date"),
        F.col("deadline").cast("date").alias("deadline"),
        F.coalesce(F.col("storyPoints"), F.lit(0.0)).cast("float").alias("story_points"),
        F.col("parent.key").alias("parent_issue_key"),
        F.col("epic.key").alias("epic_issue_key"),
        F.col("parent.key").isNotNull().alias("is_subtask"),
        _low(F.col("qaEngineer.email")).alias("qa_engineer"),
        F.coalesce(F.col("aliases"), F.array().cast("array<string>")).alias("aliases"),
        _low(F.col("project.name")).alias("project"),
        F.coalesce(
            F.transform(F.col("sprint"), lambda s: s["name"]),
            F.array().cast("array<string>"),
        ).alias("sprints"),
    )

    if raw_changelog is not None:
        flat = _apply_moved_events(flat, raw_changelog, config)
        flat = _apply_closed_at_refinement(flat, raw_changelog, config)
    else:
        flat = (
            flat.withColumn("was_moved", F.lit(False))
            .withColumn("moved_at", F.lit(None).cast("timestamp"))
            .withColumn("moved_by", F.lit(None).cast("string"))
        )

    for name, col in (extra_columns or {}).items():
        flat = flat.withColumn(name, col)
    return flat


def _apply_moved_events(
    issues_flat: DataFrame, raw_changelog: DataFrame, config: EngineConfig
) -> DataFrame:
    """P12: last IssueMoved event per issue → was_moved/moved_by/moved_at.

    The reference overwrites the fields on every moved event in loop
    order (``issue.py:162-167``) — "last event wins" = max event time.
    """
    moved = (
        raw_changelog.where(F.col("type") == config.moved_event_type)
        .select(
            "issue_key",
            parse_tracker_datetime("updatedAt").alias("_moved_at"),
            _low(F.col("updatedBy.email")).alias("_moved_by"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("issue_key").orderBy(F.col("_moved_at").desc())
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return issues_flat.join(moved, "issue_key", "left").select(
        issues_flat["*"],
        F.col("_moved_at").isNotNull().alias("was_moved"),
        F.col("_moved_at").alias("moved_at"),
        F.col("_moved_by").alias("moved_by"),
    )


def _apply_closed_at_refinement(
    issues_flat: DataFrame, raw_changelog: DataFrame, config: EngineConfig
) -> DataFrame:
    """closed_at two-path definition (``issue.py:203-210``): resolved →
    resolved_at (already set); else latest transition into a closed
    status, only while the issue's current status is closed."""
    candidates = closed_at_refinement(raw_changelog, config)
    joined = issues_flat.join(candidates, "issue_key", "left")
    refined = F.when(F.col("is_resolved"), F.col("closed_at")).otherwise(
        F.when(
            F.col("status").isin(*config.closed_statuses),
            F.col("closed_at_candidate"),
        )
    )
    return joined.withColumn("closed_at", refined).drop("closed_at_candidate")


def transform_changelog(
    raw_changelog: DataFrame, config: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """RAW_CHANGELOG_SCHEMA → ISSUES_CHANGELOG_SCHEMA (minus version).

    Explode each event's field changes to one row per (event, field) and
    P9-normalize the polymorphic values; F8 drops rows with no field
    name or both values empty (``issue.py:149-151``).
    """
    exploded = raw_changelog.select(
        "issue_key",
        F.col("queue"),
        parse_tracker_datetime("updatedAt").alias("event_time"),
        F.col("type").alias("event_type"),
        "transport",
        F.coalesce(
            _low(F.col("updatedBy.email")), F.col("updatedBy.name"), F.lit("")
        ).alias("actor"),
        F.explode("fields").alias("change"),
    )
    normalized = exploded.select(
        "issue_key",
        "queue",
        "event_time",
        "event_type",
        "transport",
        "actor",
        F.col("change.field.name").alias("changed_field"),
        extract_changelog_value(F.col("change.from")).alias("changed_from"),
        extract_changelog_value(F.col("change.to")).alias("changed_to"),
    )
    return normalized.where(
        F.col("changed_field").isNotNull()
        & ((F.col("changed_from") != "") | (F.col("changed_to") != ""))
    )


@dataclass
class EtlResult:
    issues: int
    changelog: int
    metrics: int
    watermark: dt.datetime | None
    skipped: bool = False


def run_etl(
    raw_issues: DataFrame,
    raw_changelog: DataFrame,
    output_dir: str,
    state: FileStateStore | None = None,
    state_key: str = "issues",
    search: SearchSpec | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
    extra_columns: dict[str, Column] | None = None,
) -> EtlResult:
    """One full incremental run (reference ``YandexTrackerETL.run``).

    Order of operations preserves the reference's exactly-once-ish
    contract (ST7): filter → transform → write all three tables → only
    then commit the watermark.
    """
    if search is None and state is not None:
        search = SearchSpec(watermark=state.get(state_key))
    if search is not None:
        raw_issues = apply_search(
            raw_issues, search, queue_col="queue.key", updated_col="updatedAt"
        )
        # changelog follows the filtered issue set
        keys = raw_issues.select(F.col("key").alias("issue_key")).distinct()
        raw_changelog = raw_changelog.join(F.broadcast(keys), "issue_key", "left_semi")

    if raw_issues.isEmpty():  # F4 short-circuit
        return EtlResult(0, 0, 0, None, skipped=True)

    version = F.current_timestamp()
    issues = transform_issues(raw_issues, raw_changelog, config, extra_columns)
    changelog = transform_changelog(raw_changelog, config)
    metrics = status_metrics(raw_changelog, raw_issues, config)

    candidate = compute_watermark(issues, "updated_at")
    stored = state.get(state_key) if state is not None else None
    if is_up_to_date(candidate, stored):  # F5 short-circuit
        return EtlResult(0, 0, 0, stored, skipped=True)

    # A3 run counters ride the write jobs as observed metrics — no extra
    # counting actions (the reference pays a python statement per row).
    from pyspark.sql import Observation

    obs = {name: Observation(f"etl_{name}") for name in ("issues", "changelog", "metrics")}
    write_versioned(
        issues.observe(obs["issues"], F.count(F.lit(1)).alias("n")).withColumn(
            "version", version
        ),
        f"{output_dir}/issues",
        DEDUP_KEYS["issues"],
        partition_ts_col="updated_at",
    )
    write_versioned(
        changelog.observe(obs["changelog"], F.count(F.lit(1)).alias("n")).withColumn(
            "version", version
        ),
        f"{output_dir}/issues_changelog",
        DEDUP_KEYS["issues_changelog"],
        partition_ts_col="event_time",
    )
    write_versioned(
        metrics.observe(obs["metrics"], F.count(F.lit(1)).alias("n")).withColumn(
            "version", version
        ),
        f"{output_dir}/issue_metrics",
        DEDUP_KEYS["issue_metrics"],
        partition_ts_col="last_seen",
    )
    if state is not None and candidate is not None:  # ST7 commit-after-write
        state.set(state_key, candidate)
        state.flush()
    return EtlResult(
        obs["issues"].get["n"],
        obs["changelog"].get["n"],
        obs["metrics"].get["n"],
        candidate,
    )
