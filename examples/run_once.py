"""Serverless/run-once parity with the reference's
``examples/serverless/main.py:7-14`` (a cloud-function handler calling
``run_etl`` once). The engine equivalent is a single incremental batch —
the same ``run_etl`` the scheduler mode uses, with state committed only
after a successful write (ST7).

Run: ``python examples/run_once.py <issues.parquet> <changelog.parquet>
<output_dir> [state.json]``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yandex_tracker_exporter_spark import get_spark
from yandex_tracker_exporter_spark.etl import run_etl
from yandex_tracker_exporter_spark.sources.state import FileStateStore


def handler(raw_issues_path: str, raw_changelog_path: str, output_dir: str,
            state_path: str | None = None) -> dict:
    """The cloud-function-shaped entry: one ETL pass, JSON-able result."""
    spark = get_spark(app_name="tracker-etl-run-once")
    state = FileStateStore(state_path) if state_path else None
    result = run_etl(
        spark.read.parquet(raw_issues_path),
        spark.read.parquet(raw_changelog_path),
        output_dir,
        state=state,
    )
    return {
        "statusCode": 200,
        "issues": result.issues,
        "changelog": result.changelog,
        "metrics": result.metrics,
        "skipped": result.skipped,
        "watermark": result.watermark.isoformat() if result.watermark else None,
    }


if __name__ == "__main__":
    print(handler(*sys.argv[1:]))
