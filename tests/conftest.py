import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from yandex_tracker_exporter_spark.schemas import (
    RAW_CHANGELOG_SCHEMA,
    RAW_ISSUE_SCHEMA,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[4]")
        .appName("yte-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.warehouse.dir", "/tmp/yte-spark-warehouse")
        .getOrCreate()
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def documents_df(spark):
    """The harness documents table at the test scale factor."""
    from yandex_tracker_exporter_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "documents")


def _ref(key=None, email=None, name=None):
    if email is not None or (name is not None and key is None):
        return {"email": email, "name": name}
    return {"key": key} if name is None else {"name": name}


@pytest.fixture(scope="session")
def raw_issues(spark):
    """Tracker-shaped issues per FIXTURES.md §1, incl. the README
    walkthrough issue TEST-1 and edge cases."""
    rows = [
        {
            "key": "TEST-1",
            "summary": "Implement the thing 🚀",
            "queue": {"key": "TEST"},
            "type": {"name": "Task"},
            "priority": {"name": "Critical"},
            "status": {"name": "Closed"},
            "resolution": None,
            "assignee": {"email": "Dev@Example.com", "name": "Dev"},
            "createdBy": {"email": "author@example.com", "name": "Author"},
            "qaEngineer": {"email": "qa@example.com", "name": "QA"},
            "tags": ["backend", "urgent"],
            "components": [{"name": "api"}, {"name": "db"}],
            "sprint": [{"name": "Sprint 1"}],
            "project": {"name": "Apollo"},
            "createdAt": "2023-05-01T09:00:00.000000+0000",
            "updatedAt": "2023-05-10T18:00:00.000000+0000",
            "resolvedAt": None,
            "start": "2023-05-01",
            "end": "2023-05-15",
            "deadline": "2023-06-01",
            "storyPoints": 5.0,
            "parent": None,
            "epic": {"key": "EPIC-1"},
            "aliases": ["OLD-1"],
        },
        {
            "key": "TEST-2",
            "summary": "A resolved subtask",
            "queue": {"key": "TEST"},
            "type": {"name": "subTask"},
            "priority": {"name": "Normal"},
            "status": {"name": "In progress"},
            "resolution": {"name": "Fixed"},
            "assignee": None,
            "createdBy": {"email": "author@example.com", "name": "Author"},
            "qaEngineer": None,
            "tags": None,
            "components": [],
            "sprint": None,
            "project": None,
            "createdAt": "2023-05-02T10:00:00.000000+0000",
            "updatedAt": "2023-05-11T11:30:00.000000+0000",
            "resolvedAt": "2023-05-11T11:30:00.000000+0000",
            "start": None,
            "end": None,
            "deadline": None,
            "storyPoints": None,
            "parent": {"key": "TEST-1"},
            "epic": None,
            "aliases": None,
        },
        {
            "key": "DEV-1",
            "summary": "Moved issue",
            "queue": {"key": "DEV"},
            "type": {"name": "Bug"},
            "priority": {"name": "Minor"},
            "status": {"name": "Open"},
            "resolution": None,
            "assignee": {"email": "dev2@example.com", "name": "Dev2"},
            "createdBy": {"email": "author@example.com", "name": "Author"},
            "qaEngineer": None,
            "tags": [],
            "components": None,
            "sprint": None,
            "project": {"name": "Apollo"},
            "createdAt": "2023-04-01T08:00:00.000000+0000",
            "updatedAt": "2023-05-12T09:00:00.000000+0000",
            "resolvedAt": None,
            "start": None,
            "end": None,
            "deadline": None,
            "storyPoints": 1.0,
            "parent": None,
            "epic": None,
            "aliases": None,
        },
    ]
    return spark.createDataFrame(rows, RAW_ISSUE_SCHEMA)


def _workflow_event(issue_key, ts, from_status, to_status, start, end, queue="TEST"):
    return {
        "issue_key": issue_key,
        "queue": queue,
        "updatedAt": ts,
        "type": "IssueWorkflow",
        "transport": "front",
        "updatedBy": {"email": "actor@example.com", "name": "Actor"},
        "fields": [
            {
                "field": {"id": "status", "name": "Status"},
                "from": from_status,
                "to": to_status,
            },
            {"field": {"id": "statusStartTime", "name": "Status start"}, "from": start, "to": end},
        ],
    }


@pytest.fixture(scope="session")
def raw_changelog(spark):
    """README.md:106-130 walkthrough for TEST-1 plus the FIXTURES.md §2
    required edge cases."""
    t = lambda h, d=1: f"2023-05-{d:02d}T{h:02d}:00:00.000000+0000"
    rows = [
        # --- TEST-1: Open → In progress → Testing → In progress →
        #     Testing → Ready for release → Closed (README walkthrough)
        # transition out of initial status: fields[1].from is None → createdAt
        _workflow_event("TEST-1", t(10), "Open", "In progress", None, t(10)),
        _workflow_event("TEST-1", t(12), "In progress", "Testing", t(10), t(12)),
        _workflow_event("TEST-1", t(13), "Testing", "In progress", t(12), t(13)),
        _workflow_event("TEST-1", t(15), "In progress", "Testing", t(13), t(15)),
        _workflow_event("TEST-1", t(16), "Testing", "Ready for release", t(15), t(16)),
        _workflow_event("TEST-1", t(17), "Ready for release", "Closed", t(16), t(17)),
        # corrupted event: null end time → dropped (issue.py:188-194)
        _workflow_event("TEST-1", t(18), "Closed", "Reopened", t(17), None),
        # non-status workflow event → dropped (issue.py:177-181)
        {
            "issue_key": "TEST-1",
            "queue": "TEST",
            "updatedAt": t(19),
            "type": "IssueWorkflow",
            "transport": "api",
            "updatedBy": {"email": "actor@example.com", "name": "Actor"},
            "fields": [
                {"field": {"id": "assignee", "name": "Assignee"}, "from": '"a"', "to": '"b"'},
                {"field": {"id": "x", "name": "x"}, "from": t(18), "to": t(19)},
            ],
        },
        # short workflow event (<2 fields) → dropped (issue.py:173-175)
        {
            "issue_key": "TEST-1",
            "queue": "TEST",
            "updatedAt": t(20),
            "type": "IssueWorkflow",
            "transport": "api",
            "updatedBy": {"email": "actor@example.com", "name": "Actor"},
            "fields": [
                {"field": {"id": "status", "name": "Status"}, "from": "Open", "to": "Closed"}
            ],
        },
        # IssueMoved event (issue.py:162-167)
        {
            "issue_key": "DEV-1",
            "queue": "DEV",
            "updatedAt": "2023-05-03T09:30:00.000000+0000",
            "type": "IssueMoved",
            "transport": "front",
            "updatedBy": {"email": "Mover@Example.com", "name": "Mover"},
            "fields": [],
        },
        # not-interesting event type → ignored entirely
        {
            "issue_key": "DEV-1",
            "queue": "DEV",
            "updatedAt": "2023-05-03T10:30:00.000000+0000",
            "type": "IssueCommented",
            "transport": "front",
            "updatedBy": {"email": "actor@example.com", "name": "Actor"},
            "fields": [],
        },
        # revisited-status accumulation happens in TEST-1 above
    ]
    return spark.createDataFrame(rows, RAW_CHANGELOG_SCHEMA)
