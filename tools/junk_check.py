"""JUNKCHECK: adjudicate result MOVEMENT under junk for the full contract.

``tools/junk_smoke.py`` industrialized the CRASH half of the latent-input
probe (no query may die on a junk row); this tool industrializes the
MOVEMENT half (VERDICT r9 next-round #2): for EVERY ``queries()`` entry,
run the query on the clean corpus and on a junk-injected clone of it and
adjudicate the difference against the query's documented expectation:

* ``junk_neutral`` — the result is hash-identical on both corpora: the
  query's quarantine/filter posture absorbs every junk row. This is the
  expected class for operators with an explicit junk rule (dedup,
  similarity, funnel, graph, stats, streaming, ...). The oracle is
  STILL replayed on the junk corpus (round 10.5): a neutral engine
  whose oracle crashes or diverges on junk means the committed SQL
  spec is only a clean-corpus spec — that incompleteness is surfaced
  as ``NEUTRAL_ORACLE_DIVERGES`` (a failure) so every oracle stays a
  TOTAL spec: same result as the engine on junk input too.
* ``participates_as_sql`` — the result moves, AND running the query's
  own DuckDB oracle on the SAME junk corpus reproduces the moved result
  exactly (driver protocol: row count + column names + type-aware sorted
  values). Movement is then BY DEFINITION what ANSI SQL says the junk
  rows should do (e.g. ``global_row_number`` ranks every row, count(*)
  rollups count junk rows in their groups) — moved, but not corrupted.
* ``expected_mover_documented`` — the result moves and the oracle
  cannot adjudicate it (no oracle, the oracle itself crashes on junk,
  or the engine DELIBERATELY diverges from plain SQL on junk, e.g. a
  quarantine the oracle does not model). Allowed ONLY for names listed
  in ``EXPECTED_MOVERS`` with a reviewed explanation.
* ``UNEXPLAINED`` — the result moves, the oracle does not confirm it,
  and no documented expectation exists. This fails the run (exit 1).

Usage::

    python tools/junk_check.py [SF_DIR] [--only q1,q2] [--keep]
                               [--out JUNKCHECK.json]

Builds the junk clone with the exact generator ``junk_smoke`` uses
(deterministic content), runs under a bare SparkSession (driver
protocol: ANSI on, default confs), and writes the committed artifact
``JUNKCHECK.json`` with the per-query classification.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.junk_smoke import build_junk_corpus  # noqa: E402
from tools.make_manifest import _norm, _result_md5  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: Queries whose movement under junk is EXPECTED but cannot be
#: confirmed by replaying their oracle on the junk corpus. Each entry
#: is a reviewed, human-written explanation of WHY the movement is the
#: documented semantics rather than corruption. Keep this list short —
#: the oracle replay adjudicates everything SQL-expressible.
EXPECTED_MOVERS: dict[str, str] = {
    # populated by the first adjudication run; an empty dict means the
    # whole contract is junk-neutral or oracle-confirmed.
}


def _run_spark(fn, spark, sf_dir):
    """Driver-protocol fingerprint of one query run: (n_rows, sorted
    lowercase columns, result_md5 of the normalized sorted rows)."""
    sdf = fn(spark, sf_dir)
    rows = [tuple(r) for r in sdf.collect()]
    cols = list(sdf.columns)
    norm = _norm(rows, cols)
    return len(rows), sorted(c.lower() for c in cols), _result_md5(norm, cols), norm


def _parse_args(argv: list[str]):
    import argparse

    p = argparse.ArgumentParser(
        prog="junk_check", description=__doc__.splitlines()[0]
    )
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    p.add_argument(
        "--only",
        default=None,
        help="comma-separated query names (both --only q1,q2 and --only=q1,q2)",
    )
    p.add_argument("--keep", action="store_true", help="keep the junk clone")
    p.add_argument(
        "--out",
        default=os.path.join(REPO, "JUNKCHECK.json"),
        help="artifact path (default: repo-root JUNKCHECK.json)",
    )
    a = p.parse_args(argv)
    only = set(x for x in a.only.split(",") if x) if a.only else None
    return a.sf_dir, only, a.keep, a.out


def main() -> int:
    src, only, keep, out_path = _parse_args(sys.argv[1:])
    dst = "/tmp/junk_check_sf"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    build_junk_corpus(spark, src, dst)
    print(f"junk corpus built at {dst} from {src}", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        # Spark writes each table as a DIRECTORY of part files — glob it
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dst}/{t}.parquet/*.parquet')"
        )

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    results: dict[str, dict] = {}
    counts = {
        "junk_neutral": 0,
        "participates_as_sql": 0,
        "expected_mover_documented": 0,
        "NEUTRAL_ORACLE_DIVERGES": 0,
        "UNEXPLAINED": 0,
        "ERROR": 0,
    }
    for name in sorted(qs):
        if only and name not in only:
            continue
        rec: dict = {"oracle": name in oracles}
        try:
            cn, cc, ch, _ = _run_spark(qs[name], spark, src)
            jn, jc, jh, jnorm = _run_spark(qs[name], spark, dst)
        except Exception as exc:  # noqa: BLE001 — junk_smoke owns crashes
            rec["class"] = "ERROR"
            rec["detail"] = f"{type(exc).__name__}: {str(exc)[:300]}"
            counts["ERROR"] += 1
            results[name] = rec
            print(f"{name} ERROR {rec['detail']}", flush=True)
            continue
        rec.update(
            clean_rows=cn, junk_rows=jn, clean_md5=ch, junk_md5=jh
        )
        # the oracle is ALWAYS replayed on the junk corpus when one
        # exists — the SQL string IS the documented expectation, and it
        # must be a TOTAL spec (same result as the engine on junk too),
        # not just a clean-corpus spec
        oracle_verdict = None
        if name in oracles:
            try:
                res = con.execute(oracles[name])
                drows = res.fetchall()
                dcols = [d[0] for d in res.description]
                ok = sorted(c.lower() for c in dcols) == jc and _norm(
                    drows, dcols
                ) == jnorm
                oracle_verdict = "match" if ok else "mismatch"
            except Exception as exc:  # noqa: BLE001 — recorded, not fatal
                oracle_verdict = f"oracle_error: {str(exc)[:200]}"
        rec["oracle_on_junk"] = oracle_verdict
        if ch == jh:
            rec["class"] = (
                "junk_neutral"
                if oracle_verdict in (None, "match")
                else "NEUTRAL_ORACLE_DIVERGES"
            )
        else:
            if oracle_verdict == "match":
                rec["class"] = "participates_as_sql"
            elif name in EXPECTED_MOVERS:
                rec["class"] = "expected_mover_documented"
                rec["expectation"] = EXPECTED_MOVERS[name]
            else:
                rec["class"] = "UNEXPLAINED"
        counts[rec["class"]] += 1
        results[name] = rec
        print(
            f"{name} {rec['class']}"
            + (
                f" (clean {cn} -> junk {jn} rows,"
                f" oracle_on_junk={rec.get('oracle_on_junk')})"
                if rec["class"] != "junk_neutral"
                else ""
            ),
            flush=True,
        )

    artifact = {
        "generated_utc": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "sf_dir": src,
        "protocol": (
            "per query: driver-protocol fingerprint (rows + sorted columns "
            "+ type-aware sorted-value md5) on the clean corpus and on the "
            "junk_smoke junk clone; movers adjudicated by replaying the "
            "query's DuckDB oracle on the junk corpus"
        ),
        "n_run": len(results),
        "counts": counts,
        "queries": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    bad = (
        counts["UNEXPLAINED"]
        + counts["ERROR"]
        + counts["NEUTRAL_ORACLE_DIVERGES"]
    )
    print(
        f"wrote {out_path}: {counts['junk_neutral']} neutral, "
        f"{counts['participates_as_sql']} participate-as-SQL, "
        f"{counts['expected_mover_documented']} documented movers, "
        f"{counts['NEUTRAL_ORACLE_DIVERGES']} neutral-oracle-diverges, "
        f"{counts['UNEXPLAINED'] + counts['ERROR']} unexplained/error"
    )
    if not keep:
        shutil.rmtree(dst, ignore_errors=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
