"""Run metrics via ``df.observe`` + listeners (U3/A3/A4).

The reference wraps methods with DogStatsd count/gauge/timing decorators
(``services/monitoring.py:44-77``) and logs RSS/throughput every N rows
(``etl.py:156-161``). Spark-native equivalents: ``df.observe`` attaches
named aggregates that are computed DURING the action (no extra pass —
the reference's counters each cost a python statement per row), and a
``QueryExecutionListener`` receives them asynchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def with_run_counters(df: DataFrame, name: str = "etl") -> tuple[DataFrame, Observation]:
    """Attach the reference's run counters (A3) as observed metrics:
    row count, null-key count, max updated_at. Read them from the
    returned Observation after any action on the DataFrame."""
    obs = Observation(name)
    key_col = "issue_key" if "issue_key" in df.columns else df.columns[0]
    ts_col = "updated_at" if "updated_at" in df.columns else None
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(key_col).isNull(), 1).otherwise(0)).alias("null_keys"),
    ]
    if ts_col:
        metrics.append(F.max(ts_col).alias("max_updated_at"))
    return df.observe(obs, *metrics), obs


class MetricsCollector:
    """Minimal QueryExecutionListener bridge: collects observed metrics
    per completed action (the DogStatsd-gauge analogue)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.records: list[dict] = []

    def record(self, obs: Observation, tags: dict | None = None) -> dict:
        entry = {**(tags or {}), **obs.get}
        self.records.append(entry)
        return entry
