"""TZCHECK: adjudicate result movement under session/JVM clock junk.

The fourth junk axis (VERDICT r11 #7, after row junk / binary junk /
layout junk): a real deployment does NOT run on a UTC box. The driver,
the executors' JVMs, and the Python workers can all sit in an arbitrary
zone — one with DST jumps (America/New_York), a :45 offset
(Asia/Kathmandu), or both (Pacific/Chatham). An engine whose queries
lean on the ambient zone anywhere — ``unix_timestamp``, ``date_trunc``,
string→timestamp casts, collect-side datetime conversion — silently
shifts every derived epoch/hour/day bucket when the box moves.

This repo's design claim is that timestamps are UTC-normalized at the
EDGES (``load_table`` pins ``spark.sql.session.timeZone=UTC`` on every
call; oracle-checked queries emit epoch seconds, never raw timestamps),
so the ENTIRE contract must be invariant to the ambient zone. This
probe proves it the SCHEMADRIFT way — fingerprint equality — instead of
leaving it a docstring claim.

Per zone variant, a FRESH subprocess (own JVM — ``user.timezone`` and
``TZ`` only bind at JVM/process start) runs every ``queries()`` entry
under the driver protocol with:

* ``TZ=<zone>`` in the environment (Python's libc clock),
* ``-Duser.timezone=<zone>`` on the driver JVM (Java default clock),
* ``spark.sql.session.timeZone=<zone>`` as the SESSION DEFAULT — the
  adversarial bit: load_table must WIN this conf fight at every read.

Adjudication: a UTC worker run is the baseline; every variant
fingerprint (rows + sorted columns + type-aware sorted-value md5) must
equal it → ``tz_neutral``. When the probe runs at the committed
manifest's SF, the UTC baseline is ALSO cross-checked against
``QUERIES_MANIFEST.json``'s ``result_md5`` (``manifest_match``), tying
the whole sweep back to the oracle-verified truth. Any movement is
``UNEXPLAINED`` (exit 1) unless documented in ``EXPECTED_TZ_MOVERS``.

Usage::

    python tools/tz_drift_check.py [SF_DIR] [--only q1,q2]
                                   [--out TZCHECK.json]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: DST + negative offset; +05:45 (no DST); +12:45 with DST — between
#: them they break every "offset is a whole negative/positive hour and
#: never changes" assumption an engine could hide.
ZONES = ("America/New_York", "Asia/Kathmandu", "Pacific/Chatham")

#: queries whose movement under a zone is EXPECTED, with a reviewed
#: explanation. Empty = the whole contract is tz-neutral.
EXPECTED_TZ_MOVERS: dict[tuple[str, str], str] = {}


def _parse_args(argv: list[str]):
    import argparse

    p = argparse.ArgumentParser(
        prog="tz_drift_check", description=__doc__.splitlines()[0]
    )
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p.add_argument("--only", default=None)
    p.add_argument("--out", default=os.path.join(REPO, "TZCHECK.json"))
    a = p.parse_args(argv)
    only = set(x for x in a.only.split(",") if x) if a.only else None
    return a.sf_dir, only, a.out


def _worker(zone: str, sf_dir: str, only: set[str] | None, out: str) -> None:
    """Subprocess body: run the contract under ``zone``, write
    ``{name: {"md5"|"error": ...}}`` to ``out``."""
    import time

    time.tzset()  # honor the TZ env var the parent set

    from pyspark.sql import SparkSession

    from tools.make_manifest import _norm, _result_md5

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", f"-Duser.timezone={zone}")
        .config("spark.sql.session.timeZone", zone)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert (
        spark.conf.get("spark.sql.session.timeZone") == zone
    ), "session zone did not take — the probe would be vacuous"

    import __spark_entry__ as entry

    qs = entry.queries()
    results: dict[str, dict] = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        # re-assert the adversarial session default before EVERY query:
        # load_table pins UTC as part of its edge contract, so each
        # query must re-win the fight from a freshly hostile session
        spark.conf.set("spark.sql.session.timeZone", zone)
        try:
            sdf = qs[name](spark, sf_dir)
            rows = [tuple(r) for r in sdf.collect()]
            cols = list(sdf.columns)
            results[name] = {
                "md5": _result_md5(_norm(rows, cols), cols),
                "n_rows": len(rows),
            }
        except Exception as exc:  # noqa: BLE001
            results[name] = {
                "error": f"{type(exc).__name__}: {str(exc)[:200]}"
            }
        print(f"[{zone}] {name}", flush=True)
    with open(out, "w") as fh:
        json.dump(results, fh)
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        zone, sf_dir, only_csv, out = sys.argv[2:6]
        only = set(x for x in only_csv.split(",") if x) or None
        _worker(zone, sf_dir, only, out)
        return 0

    sf_dir, only, out_path = _parse_args(sys.argv[1:])
    runs: dict[str, dict] = {}
    with tempfile.TemporaryDirectory(prefix="tzcheck_") as tmp:
        for zone in ("UTC",) + ZONES:
            out = os.path.join(tmp, zone.replace("/", "_") + ".json")
            env = {**os.environ, "TZ": zone}
            print(f"running contract under {zone}…", flush=True)
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    zone,
                    sf_dir,
                    ",".join(sorted(only)) if only else "",
                    out,
                ],
                env=env,
                cwd=REPO,
            )
            if proc.returncode != 0:
                print(f"worker for {zone} failed", file=sys.stderr)
                return 2
            with open(out) as fh:
                runs[zone] = json.load(fh)

    manifest_md5: dict[str, str] = {}
    manifest_sf = None
    mpath = os.path.join(REPO, "QUERIES_MANIFEST.json")
    if os.path.exists(mpath):
        m = json.load(open(mpath))
        manifest_sf = m.get("sf_dir")
        if manifest_sf == sf_dir:
            manifest_md5 = {
                k: v["result_md5"]
                for k, v in m.get("queries", {}).items()
                if v.get("result_md5")
            }

    base = runs["UTC"]
    results: dict[str, dict] = {}
    counts = {
        "tz_neutral": 0,
        "expected_mover_documented": 0,
        "UNEXPLAINED": 0,
        "ERROR": 0,
        "manifest_match": 0,
    }
    for name in sorted(base):
        rec: dict = {}
        if "error" in base[name]:
            rec = {"class": "ERROR", "detail": f"UTC: {base[name]['error']}"}
            counts["ERROR"] += 1
            results[name] = rec
            continue
        moved, errs = [], []
        for zone in ZONES:
            got = runs[zone].get(name, {})
            if "error" in got:
                errs.append(f"{zone}: {got['error']}")
            elif got.get("md5") != base[name]["md5"]:
                moved.append(zone)
        if name in manifest_md5:
            if base[name]["md5"] == manifest_md5[name]:
                counts["manifest_match"] += 1
                rec["manifest_match"] = True
            else:
                errs.append("UTC run diverges from committed manifest")
        rec["moved_on"] = moved
        if errs:
            rec["class"] = "ERROR"
            rec["detail"] = "; ".join(errs)
            counts["ERROR"] += 1
        elif not moved:
            rec["class"] = "tz_neutral"
            counts["tz_neutral"] += 1
        else:
            keyed = [(name, z) for z in moved]
            if all(k in EXPECTED_TZ_MOVERS for k in keyed):
                rec["class"] = "expected_mover_documented"
                rec["expectation"] = {
                    z: EXPECTED_TZ_MOVERS[(name, z)] for z in moved
                }
                counts["expected_mover_documented"] += 1
            else:
                rec["class"] = "UNEXPLAINED"
                counts["UNEXPLAINED"] += 1
        results[name] = rec

    artifact = {
        "generated_utc": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "sf_dir": sf_dir,
        "zones": list(ZONES),
        "protocol": (
            "per zone, a fresh subprocess (own JVM) with TZ env, "
            "-Duser.timezone, and spark.sql.session.timeZone all set to "
            "the zone (re-asserted before every query) runs every "
            "queries() entry under the driver-protocol fingerprint; all "
            "fingerprints must equal the UTC worker's, and the UTC "
            "worker's must equal the committed manifest at its SF"
        ),
        "manifest_cross_checked": bool(manifest_md5),
        "n_run": len(results),
        "counts": counts,
        "queries": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {os.path.basename(out_path)}: "
        f"{counts['tz_neutral']} neutral, "
        f"{counts['expected_mover_documented']} documented, "
        f"{counts['UNEXPLAINED']} unexplained, {counts['ERROR']} errors, "
        f"{counts['manifest_match']} manifest-matched",
        flush=True,
    )
    return 1 if counts["UNEXPLAINED"] or counts["ERROR"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
