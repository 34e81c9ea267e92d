"""Per-query plan-CONSTRUCTION cost: time building the DataFrame object
(``queries()[name](spark, sf_dir)``) WITHOUT executing it.

The bench times ``fn(spark, sf_dir)`` + ``count()`` together, so driver-
side construction (py4j Column round trips, SQL parsing, analysis
deferred) is paid inside every timed sample — and it is pure fixed
overhead that never scales with data, i.e. the cheapest seconds on the
board (guide §7.3: planning time as the bottleneck). Batch 4 (r12) cut
the worst offenders by rendering whole expressions as single SQL
strings; this tool ranks what is left.

    python tools/construction_profile.py [reps] [sf_dir] [query ...]

Output: one line per query, best-of-``reps`` construction seconds,
sorted descending, plus the total. Construction here is DataFrame
building only — Spark analyzes lazily, so this is dominated by py4j
traffic + driver-side Python, the exact term a real driver submission
pays before any job starts.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    only = set(sys.argv[3:])

    import __spark_entry__ as entry_mod
    from yandex_tracker_exporter_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="yte-construction-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    # warm: file-listing + the load_table memo, so construction numbers
    # reflect the steady state the bench's timed samples see
    for name, fn in qs.items():
        fn(spark, sf_dir)

    best: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            dt = time.perf_counter() - t0
            if name not in best or dt < best[name]:
                best[name] = dt

    for name, dt in sorted(best.items(), key=lambda kv: -kv[1]):
        print(f"{name}\t{dt:.3f}")
    print(f"# TOTAL construction (best-of-{reps}): {sum(best.values()):.3f}s")


if __name__ == "__main__":
    main()
