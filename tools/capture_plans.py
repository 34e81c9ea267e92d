"""Capture `.explain("formatted")` for contract queries into a directory
(round-12 optimization evidence: plans/r12/<query>_{before,after}.txt).

    python tools/capture_plans.py <outdir> <suffix> [query ...]

With no query list, captures every `queries()` entry. Uses the bench.py
session (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus) so the
plans are the ones the bench actually executes. NOTE: building some
queries runs real jobs (streaming pipeline, kmeans checkpoint probes) —
a full sweep takes a few minutes, not seconds.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as bench_mod  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    bench_mod._kill_leftover_jvms()

    import __spark_entry__ as entry_mod
    from yandex_tracker_exporter_spark.session import get_spark

    qs = entry_mod.queries()
    if not names:
        names = list(qs)
    spark = get_spark(
        app_name="yte-capture-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in qs:
            print(f"# skip unknown {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure, keep sweeping
            plan = f"ERROR building/explaining {name}: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
