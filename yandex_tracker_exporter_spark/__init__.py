"""PySpark-native analytics engine with the query and data-processing
capabilities of akimrx/yandex-tracker-exporter.

The reference (see /root/reference, SURVEY.md) is a sequential Python ETL
that flattens tracker issues, explodes changelogs into an event stream,
sessionizes status transitions into per-status cycle-time metrics, and
upserts versioned rows into ClickHouse with latest-version-wins dedup.

This package re-expresses those semantics Spark-first:

- ``schemas``     — explicit StructTypes for every table (SURVEY §1.3)
- ``functions``   — scalar function library (SURVEY §2.3, P1-P14)
- ``operators``   — dedup / sessionization / watermark / similarity /
                    text-analysis operators (SURVEY §2.4, §2.7 + scale ops)
- ``plans``       — incremental search-spec → Catalyst predicate compiler
                    (SURVEY §2.2, F1-F3)
- ``sources``     — table loaders, state store, sinks (SURVEY §2.1)
- ``streaming``   — Structured Streaming micro-batch pipeline (SURVEY §2.8)
- ``etl``         — the end-to-end issue pipeline facade (SURVEY §3)

Everything is DataFrame/Catalyst; no RDDs. Python UDFs appear only where
built-ins genuinely cannot express the semantics (business-hours calendar
durations use a vectorized pandas UDF with a pure-Spark fallback).
"""

from yandex_tracker_exporter_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
