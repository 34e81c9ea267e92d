"""Per-query stage-level profile — the measurement tool behind round-12
optimization claims (guide §1: measure first, §7.1: the UI's stage
metrics are where the time actually shows up).

    python tools/profile_query.py <query> [runs] [sf_dir]

Protocol: the solo_bench session (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cpus, driver 16g) but with the UI enabled so the REST API
(`/api/v1/applications/<id>/stages`) can be scraped after the timed
runs. Prints, for every stage the query submitted (warm runs excluded
via job-group attribution): executorRunTime, executorCpuTime, shuffle
read/write bytes, input bytes, task count — ranked by run time. This is
the local[32] stand-in for the Stages tab the guide tells you to open.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402  (warm-up pandas_udf type hints)

import bench as bench_mod  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.loads(resp.read().decode())


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    query = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    bench_mod._kill_leftover_jvms()

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from yandex_tracker_exporter_spark.session import get_spark

    qs = entry_mod.queries()
    if query not in qs:
        print(f"unknown query {query!r}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(
        app_name=f"yte-profile-{query}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    # session + python-worker warm-up (same as bench.py)
    qs["point_lookup"](spark, sf_dir).collect()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(int(cpus) * 4).repartition(int(cpus)).select(_warm("id")).count()

    fn = qs[query]
    spark.sparkContext.setJobGroup("warm", f"warm {query}")
    fn(spark, sf_dir).count()  # un-timed codegen warm
    times = []
    spark.sparkContext.setJobGroup("timed", f"timed {query}")
    spark.sparkContext.setJobDescription(f"profile:{query}")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    spark.sparkContext.setJobGroup("", "")

    app_id = spark.sparkContext.applicationId
    # jobs in the "timed" group -> their stage ids
    jobs = _get(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
    timed_stage_ids = set()
    for j in jobs:
        if j.get("jobGroup") == "timed":
            timed_stage_ids.update(j.get("stageIds", []))
    stages = _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    rows = []
    for st in stages:
        if st["stageId"] not in timed_stage_ids:
            continue
        rows.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:80],
                "tasks": st["numCompleteTasks"],
                "runTime_ms": st["executorRunTime"],
                "cpuTime_ms": st.get("executorCpuTime", 0) // 1_000_000,
                "input_MB": round(st.get("inputBytes", 0) / 1e6, 2),
                "sh_read_MB": round(st.get("shuffleReadBytes", 0) / 1e6, 2),
                "sh_write_MB": round(st.get("shuffleWriteBytes", 0) / 1e6, 2),
                "desc": (st.get("description") or "")[:60],
            }
        )
    rows.sort(key=lambda r: -r["runTime_ms"])
    out = {
        "query": query,
        "runs": runs,
        "times": [round(t, 3) for t in times],
        "best": round(min(times), 3),
        "median": round(sorted(times)[len(times) // 2], 3),
        "n_timed_stages": len(rows),
        "sum_runTime_ms": sum(r["runTime_ms"] for r in rows),
        "sum_cpuTime_ms": sum(r["cpuTime_ms"] for r in rows),
    }
    print(json.dumps(out))
    for r in rows[:25]:
        print(
            f"# stage {r['stage']:>4} tasks={r['tasks']:>3} "
            f"run={r['runTime_ms']:>7}ms cpu={r['cpuTime_ms']:>7}ms "
            f"in={r['input_MB']:>7}MB shR={r['sh_read_MB']:>6}MB "
            f"shW={r['sh_write_MB']:>6}MB  {r['name']}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
