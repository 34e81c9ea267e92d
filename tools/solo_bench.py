"""Solo per-query measurement — THE committed procedure behind any
claimed per-query number (VERDICT r5 #3: "1.40-1.42 s best-of-runs"
was not reproducible from anything committed; this tool is the fix).

    python tools/solo_bench.py <query> [runs] [sf_dir]

Protocol (identical session to bench.py):
- kill leftover JVMs first (they inflate timings 2-4x), stamp loadavg;
- local[$SPARK_GRAFT_CPUS] (default 32), shuffle_partitions = cpus,
  driver 16g, progress bars off;
- warm the session (point_lookup) and the Python-UDF worker pool;
- ONE un-timed codegen-warming execution of the query, then ``runs``
  timed executions (default 7) back-to-back, each a full ``count()``;
- report EVERY run plus best/median as one JSON line — a claim quotes
  the best AND the median, and anyone re-runs the same command.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# module-level: the warm-up pandas_udf's stringified type hints
# ("pd.Series", via `from __future__ import annotations`) resolve
# against this module's globals
import pandas as pd  # noqa: E402

import bench as bench_mod  # noqa: E402  (shared session/hygiene protocol)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    query = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    leftover = bench_mod._kill_leftover_jvms()
    try:
        loadavg = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        loadavg = None

    import __spark_entry__ as entry_mod
    from yandex_tracker_exporter_spark.session import get_spark

    qs = entry_mod.queries()
    if query not in qs:
        print(f"unknown query {query!r}; choices: {sorted(qs)}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(
        app_name="yte-spark-solo-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # session warm-up: file listing + JVM, then the Python UDF pool
    qs["point_lookup"](spark, sf_dir).collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(int(cpus) * 4).repartition(int(cpus)).select(_warm("id")).count()

    fn = qs[query]
    fn(spark, sf_dir).count()  # un-timed codegen/JIT warm run
    samples = []
    for i in range(runs):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        start = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        samples.append(round(time.perf_counter() - start, 3))
        print(f"# run {i + 1}/{runs}: {samples[-1]:.3f}s ({rows} rows)",
              file=sys.stderr)

    out = {
        "query": query,
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "runs": samples,
        "best": min(samples),
        "median": round(statistics.median(samples), 3),
        "contended": bool(leftover),
        "other_jvms": len(leftover),
        "loadavg_1m_at_start": loadavg,
    }
    sys.stderr.flush()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
