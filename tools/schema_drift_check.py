"""SCHEMADRIFT: adjudicate result movement under parquet SCHEMA drift.

A 100 TB lake's files are written by many producers over years, so the
physical layout drifts while the logical contract stands: columns get
REORDERED by a rewriting job, new columns get APPENDED by a newer
producer, and a single table directory ends up with PART FILES whose
footers disagree. An engine whose queries secretly depend on column
POSITION (or on "the schema is exactly these N columns") silently
corrupts or crashes on such a lake — the junk waves probed row-level
junk; this probe covers layout-level junk (round 11).

Three drifted clones of the corpus, each holding the SAME LOGICAL ROWS:

* ``reorder``  — every table rewritten with its columns REVERSED.
* ``extra``    — every table with an appended ``_ingest_ts`` long
  column (the classic producer-added audit column).
* ``split``    — every table as TWO part files inside one table
  directory: file A in the original column order, file B reordered AND
  carrying the extra column — per-file footer disagreement, the shape
  multi-producer directories actually have. Rows are split
  deterministically (crc32 of the first column, even/odd).
* ``debris``   — every table as a directory carrying the committer
  litter real lakes accumulate: ``_SUCCESS``, ``_started_*`` /
  ``_committed_*`` markers, ``.crc`` sidecars, ``.DS_Store``, and —
  the dangerous one — a ``_temporary/`` subtree holding a DUPLICATE
  part file from an aborted task attempt. Spark's hidden-file filter
  must drop all of it; an engine that hand-globbed ``**`` or listed
  recursively would DOUBLE every row (a loud fingerprint move), and
  one that read ``*.parquet`` per-file would miss the directory
  layout entirely (round 12).

Adjudication: every ``queries()`` entry runs on the clean corpus and
on each drifted clone under the driver protocol fingerprint (rows +
sorted columns + type-aware sorted-value md5). Expected class is
``drift_neutral`` for every query on every variant — the engine reads
columns BY NAME and never widens its projection implicitly. A query
whose result moves is ``UNEXPLAINED`` (exit 1) unless listed in
``EXPECTED_SCHEMA_MOVERS`` with a reviewed explanation.

Deliberately out of scope: physical TYPE drift (an int32 file inside a
bigint table). Spark's vectorized parquet reader refuses that read
("Parquet column cannot be converted") regardless of engine code — the
remedy is an explicit read schema at the lake boundary, not an
operator change; probing it here would measure Spark, not this repo.

Usage::

    python tools/schema_drift_check.py [SF_DIR] [--only q1,q2]
                                       [--out SCHEMADRIFT.json] [--keep]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.make_manifest import _norm, _result_md5  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

VARIANTS = ("reorder", "extra", "split", "debris")

#: queries whose movement under a drift variant is EXPECTED, with a
#: reviewed explanation. Empty = the whole contract is drift-neutral.
EXPECTED_SCHEMA_MOVERS: dict[tuple[str, str], str] = {}


def build_variant(spark, src: str, dst: str, mode: str) -> None:
    """Write one drifted clone of every table under ``dst``."""
    from pyspark.sql import functions as F

    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        out_dir = os.path.join(dst, f"{t}.parquet")
        if mode == "reorder":
            df.select(*reversed(df.columns)).coalesce(1).write.mode(
                "overwrite"
            ).parquet(out_dir)
        elif mode == "extra":
            df.withColumn(
                "_ingest_ts", F.lit(1_700_000_000).cast("long")
            ).coalesce(1).write.mode("overwrite").parquet(out_dir)
        elif mode == "split":
            # deterministic even/odd split on the first column's text;
            # file B reorders AND appends — footers disagree in one dir
            key = F.crc32(F.col(df.columns[0]).cast("string"))
            half_a = df.where(F.coalesce(key % 2, F.lit(0)) == 0)
            half_b = (
                df.where(F.coalesce(key % 2, F.lit(0)) == 1)
                .select(*reversed(df.columns))
                .withColumn("_ingest_ts", F.lit(1_700_000_000).cast("long"))
            )
            tmp_a, tmp_b = out_dir + "_a", out_dir + "_b"
            half_a.coalesce(1).write.mode("overwrite").parquet(tmp_a)
            half_b.coalesce(1).write.mode("overwrite").parquet(tmp_b)
            os.makedirs(out_dir)
            n = 0
            for tmp in (tmp_a, tmp_b):
                for f in sorted(os.listdir(tmp)):
                    if f.endswith(".parquet"):
                        os.rename(
                            os.path.join(tmp, f),
                            os.path.join(out_dir, f"part-{n:05d}.parquet"),
                        )
                        n += 1
                shutil.rmtree(tmp)
        elif mode == "debris":
            tmp = out_dir + "_tmp"
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            os.makedirs(out_dir)
            n = 0
            part = None
            for f in sorted(os.listdir(tmp)):
                if f.endswith(".parquet"):
                    part = os.path.join(out_dir, f"part-{n:05d}.parquet")
                    os.rename(os.path.join(tmp, f), part)
                    # the GENUINE checksum sidecar Hadoop's local FS
                    # wrote for this part (a real committer leaves a
                    # VALID .crc — a garbage one makes Hadoop fail the
                    # read as corruption, which is correct behavior and
                    # not what this probe measures)
                    crc = os.path.join(tmp, f".{f}.crc")
                    if os.path.exists(crc):
                        os.rename(
                            crc,
                            os.path.join(
                                out_dir,
                                f".{os.path.basename(part)}.crc",
                            ),
                        )
                    n += 1
            shutil.rmtree(tmp)
            open(os.path.join(out_dir, "_SUCCESS"), "w").close()
            open(os.path.join(out_dir, "_started_17123"), "w").close()
            with open(os.path.join(out_dir, "_committed_17123"), "w") as fh:
                fh.write('{"added":["part-00000.parquet"]}')
            with open(os.path.join(out_dir, ".DS_Store"), "wb") as fh:
                fh.write(b"\x00Bud1")
            # aborted-attempt duplicate: MUST stay invisible, else every
            # row doubles and the fingerprint moves loudly
            attempt = os.path.join(out_dir, "_temporary", "0", "attempt_1")
            os.makedirs(attempt)
            shutil.copy(part, os.path.join(attempt, "part-00000.parquet"))
        else:
            raise ValueError(mode)


def _fingerprint(fn, spark, sf_dir):
    sdf = fn(spark, sf_dir)
    rows = [tuple(r) for r in sdf.collect()]
    cols = list(sdf.columns)
    norm = _norm(rows, cols)
    return len(rows), sorted(c.lower() for c in cols), _result_md5(norm, cols)


def _parse_args(argv: list[str]):
    import argparse

    p = argparse.ArgumentParser(
        prog="schema_drift_check", description=__doc__.splitlines()[0]
    )
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    p.add_argument("--only", default=None)
    p.add_argument("--keep", action="store_true")
    p.add_argument(
        "--out", default=os.path.join(REPO, "SCHEMADRIFT.json")
    )
    a = p.parse_args(argv)
    only = set(x for x in a.only.split(",") if x) if a.only else None
    return a.sf_dir, only, a.keep, a.out


def main() -> int:
    src, only, keep, out_path = _parse_args(sys.argv[1:])
    base = "/tmp/schema_drift"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for mode in VARIANTS:
        build_variant(spark, src, os.path.join(base, mode), mode)
        print(f"built {mode} clone", flush=True)

    import __spark_entry__ as entry

    qs = entry.queries()
    results: dict[str, dict] = {}
    counts = {"drift_neutral": 0, "expected_mover_documented": 0,
              "UNEXPLAINED": 0, "ERROR": 0}
    for name in sorted(qs):
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            clean = _fingerprint(qs[name], spark, src)
        except Exception as exc:  # noqa: BLE001
            rec = {"class": "ERROR", "detail": f"clean: {str(exc)[:200]}"}
            counts["ERROR"] += 1
            results[name] = rec
            print(f"{name} ERROR(clean)", flush=True)
            continue
        moved, errs = [], []
        for mode in VARIANTS:
            try:
                got = _fingerprint(qs[name], spark, os.path.join(base, mode))
                if got != clean:
                    moved.append(mode)
            except Exception as exc:  # noqa: BLE001
                errs.append(f"{mode}: {type(exc).__name__} {str(exc)[:160]}")
        rec["moved_on"] = moved
        if errs:
            rec["class"] = "ERROR"
            rec["detail"] = "; ".join(errs)
            counts["ERROR"] += 1
        elif not moved:
            rec["class"] = "drift_neutral"
            counts["drift_neutral"] += 1
        else:
            keyed = [(name, m) for m in moved]
            if all(k in EXPECTED_SCHEMA_MOVERS for k in keyed):
                rec["class"] = "expected_mover_documented"
                rec["expectation"] = {
                    m: EXPECTED_SCHEMA_MOVERS[(name, m)] for m in moved
                }
                counts["expected_mover_documented"] += 1
            else:
                rec["class"] = "UNEXPLAINED"
                counts["UNEXPLAINED"] += 1
        results[name] = rec
        print(
            f"{name} {rec['class']}"
            + (f" (moved on {moved})" if moved or errs else "")
            + (f" {rec.get('detail', '')}" if errs else ""),
            flush=True,
        )

    artifact = {
        "generated_utc": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "sf_dir": src,
        "variants": list(VARIANTS),
        "protocol": (
            "per query: driver-protocol fingerprint (rows + sorted columns "
            "+ type-aware sorted-value md5) on the clean corpus and on "
            "three schema-drifted clones (columns reversed; _ingest_ts "
            "column appended; two-part-file tables with disagreeing "
            "footers); any movement must be documented"
        ),
        "n_run": len(results),
        "counts": counts,
        "queries": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {out_path}: {counts['drift_neutral']} neutral, "
        f"{counts['expected_mover_documented']} documented, "
        f"{counts['UNEXPLAINED']} unexplained, {counts['ERROR']} errors"
    )
    if not keep:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 1 if (counts["UNEXPLAINED"] or counts["ERROR"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
