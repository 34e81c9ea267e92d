"""Cloud-function handler, reference ``examples/serverless/main.py:7-14``
contract: ``handler(event, context)`` runs ONE incremental ETL pass
(``Trigger.AvailableNow`` semantics — process everything currently
available, commit state, return) and answers with a JSON-able
``{"statusCode": 200, "message": "success", ...}`` / ``500`` on failure.

``event`` carries the invocation parameters the reference takes from env
(paths here, since the engine's source is a parquet/DataSource scan)::

    {
        "issues": "s3a://bucket/raw/issues.parquet",
        "changelog": "s3a://bucket/raw/changelog.parquet",
        "output": "s3a://bucket/warehouse",
        "state": "s3a://bucket/state/wm.json",      # optional
        "state_backend": "s3",                       # optional (local|hadoop|s3|redis)
        "queues": "DEV,!TEST",                       # optional
    }

Unset keys fall back to ``EXPORTER_*`` env vars (see
``EngineConfig.from_env``), so a container configured for the reference
needs an event with paths only.
"""

import logging
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from yandex_tracker_exporter_spark import get_spark
from yandex_tracker_exporter_spark.config import EngineConfig
from yandex_tracker_exporter_spark.etl import run_etl
from yandex_tracker_exporter_spark.plans.search_spec import SearchSpec
from yandex_tracker_exporter_spark.sources.state import state_store_factory

logging.getLogger().setLevel(logging.INFO)


def handler(event: dict, context=None) -> dict:
    """One ETL pass per invocation; never raises (the 500 body carries
    the message), matching the reference handler's try/except shape."""
    try:
        config = EngineConfig.from_env()
        spark = get_spark(app_name="tracker-etl-serverless")
        state = None
        if event.get("state"):
            backend = event.get("state_backend", "local")
            if backend == "redis":
                state = state_store_factory("redis", url=event["state"])
            else:
                state = state_store_factory(
                    backend, path=event["state"], spark=spark
                )
        search = SearchSpec(
            queues=event.get("queues")
            or os.environ.get("EXPORTER_TRACKER__SEARCH__QUEUES"),
            watermark=state.get("issues") if state else None,
            stateful_initial_range=config.stateful_initial_range,
            search_range=config.search_range,
        )
        result = run_etl(
            spark.read.parquet(event["issues"]),
            spark.read.parquet(event["changelog"]),
            event["output"],
            state=state,
            search=search,
            config=config,
        )
        return {
            "statusCode": 200,
            "message": "success",
            "issues": result.issues,
            "changelog": result.changelog,
            "metrics": result.metrics,
            "skipped": result.skipped,
            "watermark": result.watermark.isoformat() if result.watermark else None,
        }
    except Exception as exc:  # noqa: BLE001 - the 500 contract wants the message
        return {"statusCode": 500, "message": str(exc)}
