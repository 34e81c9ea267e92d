"""Explicit StructTypes for every table in the engine (SURVEY §1.3).

The reference's in-flight schema is dynamic (duck-typed Python objects
serialized by ``Base.to_dict``, reference ``models/base.py:75-91``); at rest
it is fixed by the ClickHouse DDL (``migrations/clickhouse/000001..3``).
Here the schema is static end-to-end: nested raw payloads are typed
structs, timestamps are real ``TimestampType`` (the reference shuttles
ISO-8601 strings, ``_typing.py:4-5``), and booleans are ``BooleanType``
(the DDL uses UInt8).

Deliberate divergences from the reference, each a recorded bug there:
- counters are LongType (DDL UInt8 overflows at 255 transitions,
  ``000002…up.sql:8``);
- ``story_points`` is FloatType (DDL says Float32 but the Python side
  coerces to int, ``issue.py:98``);
- null dates stay null (the reference deletes the keys so ClickHouse
  fills epoch 0, ``helpers.py:76-87``) — epoch-0 semantics are applied
  only by the optional ClickHouse-compat export edge.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --- nested raw payloads (source side) --------------------------------------

_NAME_REF = StructType([_s("name", StringType())])
_KEY_REF = StructType([_s("key", StringType())])
_USER_REF = StructType([_s("email", StringType()), _s("name", StringType())])

#: Raw issue payload as consumed by ``TrackerIssue._transform``
#: (reference ``models/issue.py:74-107``); one row per issue version.
RAW_ISSUE_SCHEMA = StructType(
    [
        _s("key", StringType(), nullable=False),
        _s("summary", StringType()),
        _s("queue", _KEY_REF),
        _s("type", _NAME_REF),
        _s("priority", _NAME_REF),
        _s("status", _NAME_REF),
        _s("resolution", _NAME_REF),
        _s("assignee", _USER_REF),
        _s("createdBy", _USER_REF),
        _s("qaEngineer", _USER_REF),
        _s("tags", ArrayType(StringType())),
        _s("components", ArrayType(_NAME_REF)),
        _s("sprint", ArrayType(_NAME_REF)),
        _s("project", _NAME_REF),
        _s("createdAt", StringType()),
        _s("updatedAt", StringType()),
        _s("resolvedAt", StringType()),
        _s("start", StringType()),
        _s("end", StringType()),
        _s("deadline", StringType()),
        _s("storyPoints", FloatType()),
        _s("parent", _KEY_REF),
        _s("epic", _KEY_REF),
        _s("aliases", ArrayType(StringType())),
    ]
)

#: One changelog field-change: ``fields[0]`` is the status pair, ``fields[1]``
#: the [start,end) datetime pair for workflow events (``issue.py:183-187``).
CHANGELOG_FIELD_SCHEMA = StructType(
    [
        _s("field", StructType([_s("id", StringType()), _s("name", StringType())])),
        _s("from", StringType()),
        _s("to", StringType()),
    ]
)

#: Raw changelog event as consumed by ``metrics()`` /
#: ``_convert_and_save_changelog`` (``issue.py:126-160,242-253``).
RAW_CHANGELOG_SCHEMA = StructType(
    [
        _s("issue_key", StringType(), nullable=False),
        _s("queue", StringType()),
        _s("updatedAt", StringType()),
        _s("type", StringType()),
        _s("transport", StringType()),
        _s("updatedBy", _USER_REF),
        _s("fields", ArrayType(CHANGELOG_FIELD_SCHEMA)),
    ]
)


# --- flattened destination tables (DDL parity) ------------------------------

#: ``issues`` fact table (``000001_create_table_issues.up.sql:1-45``).
ISSUES_SCHEMA = StructType(
    [
        _s("version", TimestampType(), nullable=False),
        _s("queue", StringType()),
        _s("title", StringType()),
        _s("issue_key", StringType(), nullable=False),
        _s("issue_type", StringType()),
        _s("priority", StringType()),
        _s("status", StringType()),
        _s("resolution", StringType()),
        _s("assignee", StringType()),
        _s("author", StringType()),
        _s("qa_engineer", StringType()),
        _s("tags", ArrayType(StringType())),
        _s("components", ArrayType(StringType())),
        _s("project", StringType()),
        _s("created_at", TimestampType()),
        _s("updated_at", TimestampType()),
        _s("deadline", DateType()),
        _s("closed_at", TimestampType()),
        _s("resolved_at", TimestampType()),
        _s("start_date", DateType()),
        _s("end_date", DateType()),
        _s("is_subtask", BooleanType()),
        _s("is_closed", BooleanType()),
        _s("is_resolved", BooleanType()),
        _s("story_points", FloatType()),
        _s("sprints", ArrayType(StringType())),
        _s("parent_issue_key", StringType()),
        _s("epic_issue_key", StringType()),
        _s("aliases", ArrayType(StringType())),
        _s("was_moved", BooleanType()),
        _s("moved_at", TimestampType()),
        _s("moved_by", StringType()),
    ]
)

#: ``issue_metrics`` aggregate (``000002…up.sql:1-17``); dedup key
#: (issue_key, status_name, last_seen).
ISSUE_METRICS_SCHEMA = StructType(
    [
        _s("version", TimestampType(), nullable=False),
        _s("last_seen", TimestampType()),
        _s("issue_key", StringType(), nullable=False),
        _s("status_name", StringType()),
        _s("status_transitions_count", LongType()),
        _s("duration", LongType()),
        _s("human_readable_duration", StringType()),
        _s("busdays_duration", LongType()),
        _s("human_readable_busdays_duration", StringType()),
    ]
)

#: ``issues_changelog`` event log (``000003…up.sql:1-18``); dedup key
#: (issue_key, event_time, event_type, changed_field).
ISSUES_CHANGELOG_SCHEMA = StructType(
    [
        _s("version", TimestampType(), nullable=False),
        _s("event_time", TimestampType()),
        _s("issue_key", StringType(), nullable=False),
        _s("queue", StringType()),
        _s("event_type", StringType()),
        _s("transport", StringType()),
        _s("actor", StringType()),
        _s("changed_field", StringType()),
        _s("changed_from", StringType()),
        _s("changed_to", StringType()),
    ]
)

#: Dedup (ReplacingMergeTree ORDER BY) keys per table — SURVEY §1.4.
DEDUP_KEYS = {
    "issues": ["issue_key"],
    "issue_metrics": ["issue_key", "status_name", "last_seen"],
    "issues_changelog": ["issue_key", "event_time", "event_type", "changed_field"],
}

#: Synthetic harness tables (TESTDATA.md) — names only; schemas come from
#: the parquet footers.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
