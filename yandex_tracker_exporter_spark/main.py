"""CLI entry (reference ``main.py`` lifecycle, SURVEY §3.1).

The reference wires an APScheduler interval loop around one ETL pass
(``main.py:138-147``) with ``--run-once`` for single execution. Engine
equivalent: argparse + the same ``run_etl`` — loop mode is a plain
interval loop (the heavy lifting is Spark's; the scheduler needs no
framework), run-once is the serverless shape.

Usage::

    python -m yandex_tracker_exporter_spark.main \
        --issues raw_issues.parquet --changelog raw_changelog.parquet \
        --output /warehouse --state state.json [--run-once]
        [--interval-minutes 30] [--queues "DEV,!TEST"]
"""

from __future__ import annotations

import argparse
import logging
import time

import os

from yandex_tracker_exporter_spark.config import (
    EngineConfig,
    env_state_store_settings,
)
from yandex_tracker_exporter_spark.etl import run_etl
from yandex_tracker_exporter_spark.plans.search_spec import SearchSpec
from yandex_tracker_exporter_spark.session import get_spark
from yandex_tracker_exporter_spark.sources.state import state_store_factory

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tracker-exporter-spark")
    p.add_argument("--issues", required=True, help="raw issues parquet path")
    p.add_argument("--changelog", required=True, help="raw changelog parquet path")
    p.add_argument("--output", required=True, help="warehouse output dir")
    p.add_argument("--state", default=None, help="watermark state JSON path")
    p.add_argument(
        "--state-backend",
        default="local",
        choices=["local", "hadoop", "s3", "redis"],
        help="watermark store backend (reference state/factory.py strategies): "
        "local JSON file, hadoop/s3 (any Hadoop FS path incl. s3a://), or "
        "redis (--state becomes the redis URL)",
    )
    p.add_argument(
        "--queues",
        default=None,
        help='queue spec, e.g. "DEV,!TEST" (default: '
        "$EXPORTER_TRACKER__SEARCH__QUEUES)",
    )
    p.add_argument(
        "--backfill-range",
        default=None,
        help="initial backfill window when no watermark exists "
        "(reference stateful_initial_range, e.g. '1w', '3mo'; default: "
        "$EXPORTER_STATEFUL_INITIAL_RANGE or '1w')",
    )
    p.add_argument("--run-once", action="store_true")
    p.add_argument("--interval-minutes", type=int, default=30)
    p.add_argument("--max-runs", type=int, default=None, help="stop after N runs")
    return p


def run(args: argparse.Namespace) -> list:
    # reference parity: a container configured with EXPORTER_* env vars
    # needs no flags — CLI flags override env, env overrides defaults
    config = EngineConfig.from_env()
    queues = args.queues or os.environ.get("EXPORTER_TRACKER__SEARCH__QUEUES")
    backfill = args.backfill_range or config.stateful_initial_range

    spark = get_spark(app_name="tracker-exporter-spark")
    state = None
    if args.state:
        if args.state_backend == "redis":
            state = state_store_factory("redis", url=args.state)
        else:
            state = state_store_factory(
                args.state_backend, path=args.state, spark=spark
            )
    elif os.environ.get("EXPORTER_STATE__STORAGE") or os.environ.get(
        "EXPORTER_STATE__JSONFILE_PATH"
    ):
        env_state = env_state_store_settings()
        state = state_store_factory(
            env_state["strategy"],
            path=env_state["path"],
            url=env_state["url"],
            spark=spark,
        )
    results = []
    runs = 0
    while True:
        search = SearchSpec(
            queues=queues,
            watermark=state.get("issues") if state else None,
            stateful_initial_range=backfill,
            search_range=backfill,
        )
        result = run_etl(
            spark.read.parquet(args.issues),
            spark.read.parquet(args.changelog),
            args.output,
            state=state,
            search=search,
            config=config,
        )
        results.append(result)
        logger.info(
            "run=%d issues=%d metrics=%d skipped=%s watermark=%s",
            runs, result.issues, result.metrics, result.skipped, result.watermark,
        )
        runs += 1
        if args.run_once or (args.max_runs is not None and runs >= args.max_runs):
            return results
        time.sleep(args.interval_minutes * 60)


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=logging.INFO)
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
