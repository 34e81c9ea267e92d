"""Emit QUERIES_MANIFEST.json: the contract's authoritative query list.

VERDICT r4 #1: the driver's correctness artifact has been pinned at the
round-2 query list (50 entries) while the contract grew to 140+; this
manifest is the repo-side evidence of the FULL contract — one entry per
``queries()`` key with whether a DuckDB oracle exists and the result of
a driver-protocol verification run (row count + column names + exact
sorted values) at the given scale, executed by THIS script at stamp
time. Regenerate with:

    python tools/make_manifest.py [sf_dir]

The sweep is the same protocol the driver gate runs (bare SparkSession,
no custom confs), so a green manifest is a driver-gate prediction, not
just a pytest echo.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cell(v) -> str:
    """Canonical text form of one result cell, type-aware: numerically
    equal values compare equal even when the two engines hand them back
    as bitwise-different doubles, Decimal vs float, or '0' vs '0.0'
    (driver ADVICE r5 — raw str() made float columns compare by repr).
    Floats canonicalize to 12 significant digits (cross-engine noise is
    ~1 ulp; 12 digits absorbs it while still catching real mismatches);
    integral floats print as integers."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{_cell(k)}:{_cell(v[k])}" for k in sorted(v, key=str)
        ) + "}"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v in (float("inf"), float("-inf")):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return format(v, ".12g")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _norm(rows, cols):
    """Column-name-sorted, row-sorted canonical cell grid (the driver
    compare's shape, with the type-aware cell normalizer)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(tuple(_cell(r[i]) for i in idx) for r in rows)


def _result_md5(norm_rows, cols) -> str:
    """md5 of the normalized sorted rows + sorted column names — lets a
    consumer diff two manifests for result regressions without
    re-running Spark (VERDICT r5 #7)."""
    h = hashlib.md5()
    h.update(("\x1f".join(sorted(c.lower() for c in cols)) + "\x1e").encode())
    for row in norm_rows:
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as m

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = m.queries(), m.oracle_sql()
    entries = {}
    n_fail = 0
    for name in sorted(qs):
        has_oracle = name in oracles
        status = "no-oracle"
        result_md5 = None
        n_rows = None
        if has_oracle:
            try:
                sdf = qs[name](spark, sf)
                srows = [tuple(r) for r in sdf.collect()]
                res = con.execute(oracles[name])
                drows = res.fetchall()
                dcols = [d[0] for d in res.description]
                snorm = _norm(srows, sdf.columns)
                ok = [c.lower() for c in dcols] == [
                    c.lower() for c in sdf.columns
                ] and snorm == _norm(drows, dcols)
                status = "verified" if ok else "MISMATCH"
                result_md5 = _result_md5(snorm, sdf.columns)
                n_rows = len(srows)
            except Exception as exc:  # noqa: BLE001 - manifest records it
                status = f"ERROR: {str(exc)[:120]}"
        if status not in ("verified", "no-oracle"):
            n_fail += 1
        entries[name] = {
            "oracle": has_oracle,
            "status": status,
            "result_md5": result_md5,
            "n_rows": n_rows,
        }
        print(name, status, flush=True)

    manifest = {
        "generated_utc": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "sf_dir": sf,
        "protocol": (
            "bare SparkSession local[8]; per query: row count + column "
            "names + sorted values (type-aware numeric canonicalization, "
            "floats at 12 sig digits) vs DuckDB oracle; result_md5 = md5 "
            "of the normalized Spark rows + sorted columns"
        ),
        "n_queries": len(entries),
        "n_with_oracle": sum(1 for e in entries.values() if e["oracle"]),
        "n_verified": sum(
            1 for e in entries.values() if e["status"] == "verified"
        ),
        "n_failed": n_fail,
        "queries": entries,
    }
    out_path = os.path.join(REPO, "QUERIES_MANIFEST.json")
    with open(out_path, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {out_path}: {manifest['n_verified']}/{manifest['n_queries']} "
        f"verified, {n_fail} failed"
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
