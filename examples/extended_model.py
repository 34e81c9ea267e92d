"""U1 extension-surface parity with the reference's
``examples/extended_model/main.py:8-31``: the reference subclasses
``TrackerIssue`` to add computed attributes; here extra columns are
plain Column expressions threaded through the projection — same effect,
but Catalyst-optimized and schema-checked.

Run: ``python examples/extended_model.py`` (expects tracker-shaped
parquet inputs; see tests/conftest.py for the fixture schemas).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark import get_spark
from yandex_tracker_exporter_spark.etl import transform_issues

# The reference example adds `labels` / custom computed fields by
# overriding the model class. The engine equivalent: a dict of
# (column name → expression) evaluated inside the wide projection.
EXTRA_COLUMNS = {
    # lead time in days, computed from the engine's own columns
    "lead_time_days": (
        F.datediff(F.col("closed_at").cast("date"), F.col("created_at").cast("date"))
    ),
    # business-rule flag, as the reference example computes per row
    "is_stale": F.col("updated_at")
    < F.current_timestamp() - F.expr("interval 30 days"),
}


def main(raw_issues_path: str, raw_changelog_path: str) -> None:
    spark = get_spark(app_name="extended-model-example")
    raw_issues = spark.read.parquet(raw_issues_path)
    raw_changelog = spark.read.parquet(raw_changelog_path)
    flat = transform_issues(raw_issues, raw_changelog, extra_columns=EXTRA_COLUMNS)
    flat.show(20, truncate=False)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
