"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. The FULL per-query map lives in
BENCH_SUMMARY.json next to this file; the stdout line carries only the
slowest queries so it stays well under 2,000 characters — a consumer
that tail-captures a bounded slice of stdout (observed: 2,000 chars)
can always parse it, and `queries_file` points at the complete map.

Timing counts full execution of each query (count() on the executors)
after a warm-up pass of the session AND of the Python UDF workers (the
first pandas-UDF query otherwise pays ~5 s of worker spin-up that is not
the query's cost). Per query: $SPARK_GRAFT_BENCH_PASSES (default 3)
minutes-apart sweeps, each an un-timed codegen-warming run followed by
($SPARK_GRAFT_BENCH_RUNS - 1) timed runs (see the sampling-scheme
comment in main()). The headline ``value``/``value_minima`` is the sum
of per-query minima across all samples (the in-artifact noise floor);
``value_median`` is the typical-run total; the spread distribution +
``minima_trusted`` gate make the artifact self-adjudicating under this
host's up-to-35% invisible outside load (VERDICT r7 #2).

Hygiene: leftover JVMs from earlier experiments inflate timings 2-4× —
the harness detects other live java processes at startup, warns on
stderr, and stamps ``"contended": true`` into the JSON so a polluted run
is never mistaken for a regression. Between queries the cache is cleared
and the JVM GC'd so one query's leftovers aren't billed to the next.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd

import __spark_entry__ as entry_mod
from yandex_tracker_exporter_spark.session import get_spark


def _other_jvms() -> list[int]:
    """PIDs of LIVE java processes not descended from this bench run.

    Zombies (state Z) are excluded: a just-exited Spark session's JVM
    lingers as an unkillable zombie until its parent reaps it, holds no
    CPU or memory, and was the recurring false-positive behind
    ``contended: true, other_jvms: 1`` artifacts — back-to-back bench
    invocations always see the previous run's corpse for a second."""
    pids = []
    try:
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat") as fh:
                    stat = fh.read()
                comm = stat[stat.index("(") + 1: stat.rindex(")")]
                state = stat[stat.rindex(")") + 2: stat.rindex(")") + 3]
                if comm == "java" and state != "Z":
                    pids.append(int(entry))
            except (OSError, ValueError):
                continue
    except OSError:
        pass
    return pids


def _jvm_info(pid: int) -> dict:
    """pid / ppid / uid / first 120 chars of cmdline for a java process
    — enough to adjudicate WHAT a surviving JVM is (the r6 artifact
    reported ``other_jvms: 1`` with no identity, so the contention flag
    could never be resolved as 'permanent harness property' vs 'stray')."""
    info: dict = {"pid": pid, "ppid": None, "uid": None, "cmdline": ""}
    try:
        info["uid"] = os.stat(f"/proc/{pid}").st_uid
    except OSError:
        pass
    try:
        with open(f"/proc/{pid}/stat") as fh:
            # field 4 of /proc/pid/stat, after the parenthesized comm
            info["ppid"] = int(fh.read().rsplit(")", 1)[1].split()[1])
    except (OSError, ValueError, IndexError):
        pass
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as fh:
            raw = fh.read().replace(b"\x00", b" ").strip()
        info["cmdline"] = raw[:120].decode("utf-8", "replace")
    except OSError:
        pass
    return info


def _spark_jvms() -> list[int]:
    """The subset of :func:`_other_jvms` whose cmdline identifies a
    Spark JVM (spark-submit / pyspark launcher / Spark driver class)
    AND which belongs to the current user. Only these are safe to
    kill: on a shared host a bare 'java' comm could be an IDE, a build
    daemon, or another service's JVM, and even a Spark cmdline owned
    by a DIFFERENT user is someone else's live job, not our leftover."""
    pids = []
    uid = os.getuid()
    for pid in _other_jvms():
        try:
            if os.stat(f"/proc/{pid}").st_uid != uid:
                continue
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                if b"spark" in fh.read().lower():
                    pids.append(pid)
        except OSError:
            continue
    return pids


def _kill_leftover_jvms() -> list[int]:
    """Best-effort TERM (then KILL) of OUR OWN user's Spark JVMs left
    over from earlier sessions. bench.py runs before our own JVM
    exists, so every live same-uid Spark JVM at this point is a
    leftover that would inflate timings 2-4x. Non-Spark java processes
    and other users' JVMs are never signalled — they are reported as
    contention (with pid/ppid/cmdline identity), not treated as ours
    to kill. Opt out with SPARK_GRAFT_NO_KILL=1. Returns the java PIDs
    still alive afterwards (Spark or not: they all contend)."""
    import signal

    targets = _spark_jvms()
    if not targets or os.environ.get("SPARK_GRAFT_NO_KILL") == "1":
        return _other_jvms()
    for sig in (signal.SIGTERM, signal.SIGKILL):
        for pid in targets:
            try:
                os.kill(pid, sig)
            except (OSError, ProcessLookupError):
                pass
        deadline = time.time() + (5.0 if sig == signal.SIGTERM else 2.0)
        while time.time() < deadline and _spark_jvms():
            time.sleep(0.2)
        if not _spark_jvms():
            break
    survivors = _other_jvms()
    if survivors:
        for pid in survivors[:5]:
            info = _jvm_info(pid)
            print(
                f"# WARNING: surviving JVM pid={info['pid']} "
                f"ppid={info['ppid']} uid={info['uid']} "
                f"cmdline={info['cmdline']!r}",
                file=sys.stderr,
            )
    else:
        print(
            f"# killed {len(targets)} leftover Spark JVM(s) before benching",
            file=sys.stderr,
        )
    return survivors


def _spread_stats(samples: dict[str, list[float]]) -> tuple[float, float, float]:
    """(p50, p90, max) of the per-query best-vs-second-best spread —
    the trust gate's input, shared by the final artifact fields and the
    mid-run retry decision."""
    spread = sorted(
        s2 - s1
        for s in samples.values()
        if len(s) > 1
        for s1, s2 in [sorted(s)[:2]]
    )
    if not spread:
        return 0.0, 0.0, 0.0
    return (
        round(spread[len(spread) // 2], 3),
        round(spread[int(len(spread) * 0.9)], 3),
        round(spread[-1], 3),
    )


def _minima_trusted(samples: dict[str, list[float]]) -> bool:
    """The r7 trust gate: second-best samples must corroborate the
    minima — spread p90 within 0.25 s and no query above 1.0 s."""
    _, p90, mx = _spread_stats(samples)
    return bool(p90 <= 0.25 and mx <= 1.0)


def _failed_tasks_for_group(sc, group: str) -> int:
    """Failed-task count for every job submitted under ``group``, read
    from the status tracker RIGHT AFTER the query runs (the store
    retains only ~1000 recent stages, so a whole-run sweep at the end
    would silently lose early queries). VERDICT r9 "What's wrong" #2:
    the r9 artifact's tail carried an unattributed DAGScheduler stack
    fragment — a recovered task retry with no owner. This counter makes
    a retry attributable: per-query counts land in the artifact, so a
    stack fragment in the tail names its query instead of reading as
    either noise or silence."""
    st = sc.statusTracker()
    n = 0
    for jid in st.getJobIdsForGroup(group):
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is not None:
                n += si.numFailedTasks
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # runs=N means each of the two sweeps times N-1 executions after an
    # un-timed warming run (see the sampling-scheme comment below), so
    # the default 2 costs 4 executions per query — ~9-10 min wall for
    # the 81-query contract at sf0.1, the same budget as the earlier
    # back-to-back best-of-3. Raise to 3 for tighter minima when wall
    # time is not a concern.
    runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    # N minutes-apart sweeps (VERDICT r7 #2): this host injects up to
    # 35% invisible outside noise (seven same-code r7 runs spanned
    # 74.6-101 s with the guest idle), and best-of-2 samples cannot
    # price that. Three sweeps give every query >=3 samples, so the
    # per-query minimum is a reproducible in-artifact noise floor
    # instead of a cross-artifact NOTES claim.
    passes = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # contention guard BEFORE our own JVM exists — kill leftovers first
    # (they are always strays from an earlier session in this container)
    leftover = _kill_leftover_jvms()
    try:
        loadavg_start = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        loadavg_start = None
    if leftover:
        print(
            f"# WARNING: {len(leftover)} other JVM(s) running ({leftover[:5]}…) — "
            "timings will be inflated; rerun on a quiet box",
            file=sys.stderr,
        )

    spark = get_spark(
        app_name="yte-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            # progress bars write \r-terminated fragments that can splice
            # into the summary line and break the driver's JSON parse
            # (observed: BENCH_r04.json "parsed": null) — keep stdout clean
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + file listing so the first query isn't penalized…
    entry_mod.queries()["point_lookup"](spark, sf_dir).collect()
    # …and the Python UDF worker pool (first pandas-UDF use costs ~5 s of
    # fork/import that belongs to the session, not to any one query)
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(int(cpus) * 4).repartition(int(cpus)).select(
        _warm("id")
    ).count()

    # Sampling scheme: `passes` (>=2, default 3) full-suite sweeps,
    # each taking the min of
    # `runs - 1` back-to-back executions (plus one un-timed warm run at
    # the head of each group — generated-code JIT state does NOT
    # survive a full sweep, because Spark's codegen cache is bounded
    # and 80+ distinct plans evict it, so the first execution in any
    # sweep is 2-3× cold).  Why minutes-apart sweeps: this box's
    # OUTSIDE load
    # oscillates with a ~5 min period (shorter than a sweep), and with
    # a single consecutive group every sample of a query can sit in the
    # same wave — observed as 2-5 random per-query "regressions" per
    # artifact, different queries each run, all re-measuring fine solo.
    # Minutes-apart sweeps make a wave survive the min() only if it
    # spans all of them; three sweeps (r8) give every query >=3 samples
    # so the spread fields can price the noise the min() absorbed.
    # A pure pass-interleaved scheme (one execution per
    # pass) was tried and REJECTED: it re-pays the codegen-cold first
    # run in every pass and inflated JIT-heavy queries 2-3×.
    # Trusted-window retry (VERDICT r10 #1): both r10 artifacts shipped
    # `minima_trusted: false` — the round's official number was climate-
    # inflated and the cross-round record fell back to worktree A/Bs.
    # Instead of committing an untrusted artifact, run up to
    # $SPARK_GRAFT_BENCH_MAX_EXTRA_PASSES (default 2) ADDITIONAL
    # minutes-apart sweeps when the spread gate fails after the planned
    # passes: extra samples can only LOWER per-query minima and tighten
    # best-vs-second-best spread, so each retry strictly improves the
    # artifact, and the host's ~5-min load wave usually passes within
    # one extra sweep. If the box never quiets, the artifact still
    # says `minima_trusted: false` (plus how hard it tried) — the gate
    # refuses to LABEL noise as signal, not to report at all (the
    # driver needs its one JSON line every round).
    max_extra = max(
        0, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA_PASSES", "2"))
    )
    samples: dict[str, list[float]] = {}
    task_failures: dict[str, int] = {}
    loadavg_per_pass: list[float] = []
    per_pass = max(1, runs - 1)
    pass_idx, planned = 0, passes
    while pass_idx < planned:
        try:
            loadavg_per_pass.append(
                float(open("/proc/loadavg").read().split()[0])
            )
        except OSError:
            pass
        for name, fn in entry_mod.queries().items():
            rows = 0
            # job group = (pass, query): every job this query submits —
            # warm run included — is attributable in the status tracker
            group = f"bench:p{pass_idx}:{name}"
            spark.sparkContext.setJobGroup(group, f"bench {name}")
            fn(spark, sf_dir).count()  # un-timed: warm codegen/JIT
            for _ in range(per_pass):
                start = time.perf_counter()
                df = fn(spark, sf_dir)
                rows = df.count()  # full execution; count avoids driver skew
                elapsed = time.perf_counter() - start
                samples.setdefault(name, []).append(elapsed)
            # read failures NOW, before the tracker evicts these stages
            nf = _failed_tasks_for_group(spark.sparkContext, group)
            if nf:
                task_failures[name] = task_failures.get(name, 0) + nf
            spark.sparkContext.setJobGroup("", "")
            if pass_idx >= passes - 1:
                print(
                    f"# {name}: {min(samples[name]):.3f}s ({rows} rows)",
                    file=sys.stderr,
                )
            # isolation between queries: drop cached relations and collect
            # garbage so one query's leftovers (cache entries, broadcast
            # blocks, codegen classes) don't turn into GC pauses billed to
            # the NEXT query (measured: multi-second spikes on trivial
            # queries late in the run without this)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        pass_idx += 1
        if pass_idx >= planned and not _minima_trusted(samples):
            if planned < passes + max_extra:
                p50, p90, mx = _spread_stats(samples)
                print(
                    f"# minima not trusted after {pass_idx} sweeps "
                    f"(spread p90={p90}s max={mx}s) — retrying with an "
                    "extra minutes-apart sweep",
                    file=sys.stderr,
                )
                planned += 1
    # Per-query MINIMUM across all samples (>=passes of them): the
    # noise floor. With >=3 minutes-apart samples this is robust to
    # the host's ~5-min load waves — an outside-noise spike must hit
    # every sweep to survive the min(). `value` keeps its historical
    # definition (sum of per-query minima) so the BENCH_r* series
    # stays comparable; `value_minima` names the same total explicitly
    # as the claim-grade noise floor, and `value_median` is the
    # honest typical-run total the noise CAN reach.
    timings = {name: round(min(s), 3) for name, s in samples.items()}
    medians = {
        name: round(sorted(s)[len(s) // 2], 3) for name, s in samples.items()
    }
    # best-vs-second-run spread per query: on a contended box the min()
    # can still be inflated, and the spread is the tell — a query whose
    # second-best is far above its best was racing outside load, so a
    # per-query "regression" vs an earlier artifact is interpretable
    # without re-running. Lives only in the sidecar (full map).
    spread = {
        name: round(sorted(s)[1] - sorted(s)[0], 3)
        for name, s in samples.items()
        if len(s) > 1
    }

    total = round(sum(timings.values()), 3)
    spread_p50, spread_p90, spread_max = _spread_stats(samples)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "value_minima": total,
        "value_median": round(sum(medians.values()), 3),
        # VERDICT r11 #3: the caveat travels WITH the artifact so no
        # committed record invites a median-to-median comparison
        "median_caveat": (
            "value_median rides the box's load waves (r11: 116.9 vs "
            "96.0 s on byte-identical code, same day); cross-round "
            "comparisons must quote value_minima only — see "
            "tools/bench_diff.py"
        ),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "bench_runs": runs,
        "bench_passes": passes,
        # trusted-window retry accounting (VERDICT r10 #1): passes_run >
        # bench_passes means the gate failed mid-run and extra sweeps
        # were spent hunting a quiet window; the per-pass loadavg series
        # shows the wave the retries were dodging.
        "bench_passes_run": pass_idx,
        "bench_extra_passes": pass_idx - passes,
        "samples_per_query": pass_idx * per_pass,
        "n_queries": len(timings),
        # spread distribution + trust gate (VERDICT r7 #2): a committed
        # minima claim is only quotable when the second-best samples
        # corroborate the minima — p90 within 0.25 s and no query's
        # spread above 1.0 s. Otherwise the artifact says so itself.
        "spread_p50": spread_p50,
        "spread_p90": spread_p90,
        "spread_max": spread_max,
        "minima_trusted": _minima_trusted(samples),
        "loadavg_per_pass": loadavg_per_pass,
    }
    # task retries (VERDICT r9 #2): expected 0 on a quiet host; nonzero
    # names the query whose stack fragment may appear in a captured
    # tail. Streaming queries run their micro-batch jobs on their own
    # threads (job groups are thread-local), so their retries — if any —
    # are not attributed here; batch queries are fully covered.
    out["task_failures"] = sum(task_failures.values())
    if task_failures:
        out["task_failures_by_query"] = task_failures
    out["contended"] = bool(leftover)
    out["other_jvms"] = len(leftover)
    # identity of every surviving JVM (pid/ppid/uid/cmdline head) so a
    # contended artifact is adjudicable: "the driver's own runner" is a
    # permanent harness property, a stray is a bug to chase
    out["other_jvm_info"] = [_jvm_info(p) for p in leftover[:5]]
    out["queries_spread"] = spread
    out["queries_median"] = medians
    if spread:
        out["max_spread_query"] = max(spread, key=spread.get)
        out["max_spread_sec"] = spread[out["max_spread_query"]]
    # External (non-JVM) load inflates timings uniformly and is invisible
    # to the leftover-JVM guard — stamp the pre-run 1-min load average so
    # an inflated artifact is self-documenting (quiet box ≈ 1-2 here).
    if loadavg_start is not None:
        out["loadavg_1m_at_start"] = loadavg_start
    # Durable FULL copy first: the complete per-query map lives here; it
    # survives even if stdout is spliced or the process dies mid-print.
    summary_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SUMMARY.json"
    )
    try:
        with open(summary_path, "w") as fh:
            fh.write(json.dumps(out) + "\n")
    except OSError:
        pass
    # The stdout line must stay under a consumer's bounded tail capture
    # (observed: last 2,000 chars) — the full 149-query map is ~4,000
    # chars and can NEVER parse from such a tail. Print a compact line:
    # totals + the slowest queries only, with a pointer to the sidecar.
    compact = dict(out)
    # full-map fields live only in the sidecar — they'd blow the
    # bounded tail capture the compact line exists to fit
    compact.pop("queries_spread", None)
    compact.pop("queries_median", None)
    compact.pop("other_jvm_info", None)
    ranked = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    # Shrink the slowest-queries map until the line fits the consumer's
    # tail capture — never die (or no-op under -O) on an oversized line:
    # a missing final JSON line is the exact failure this path prevents.
    for keep in range(min(12, len(ranked)), -1, -1):
        compact["queries"] = dict(ranked[:keep])
        compact["queries_truncated_to_slowest"] = keep
        compact["queries_file"] = "BENCH_SUMMARY.json"
        line = json.dumps(compact)
        if len(line) < 1800:
            break
    # …the JSON as the absolute last stdout line: flush both streams,
    # lead with a newline so any unterminated \r fragment can't prefix it.
    sys.stderr.flush()
    sys.stdout.flush()
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()