"""Driver-protocol oracle check for a SUBSET of queries — the fast
inner loop for optimization rounds (full `make_manifest.py` sweeps stay
the commit gate; this is the per-change spot check).

    python tools/verify_queries.py <sf_dir> <query> [query ...]
    python tools/verify_queries.py <sf_dir> ALL

Identical compare protocol to make_manifest.py (bare local[8] session,
row count + column names + type-aware sorted values vs DuckDB), via
direct import of its helpers so the two can never drift.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.make_manifest import _norm  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sf = sys.argv[1]
    names = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
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
    if names == ["ALL"]:
        names = sorted(qs)
    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"FAIL {name}: unknown query")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle")
            continue
        try:
            sdf = qs[name](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
            cols_ok = [c.lower() for c in dcols] == [
                c.lower() for c in sorted(sdf.columns, key=str.lower)
            ] or sorted(c.lower() for c in dcols) == sorted(
                c.lower() for c in sdf.columns
            )
            snorm = _norm(srows, sdf.columns)
            dnorm = _norm(drows, dcols)
            if len(srows) == len(drows) and cols_ok and snorm == dnorm:
                print(f"ok   {name}: {len(srows)} rows")
            else:
                n_fail += 1
                print(
                    f"FAIL {name}: spark={len(srows)} duck={len(drows)} "
                    f"cols_ok={cols_ok}"
                )
                for i, (a, b) in enumerate(zip(snorm, dnorm)):
                    if a != b:
                        print(f"  first diff row {i}:\n    spark={a}\n    duck ={b}")
                        break
        except Exception as exc:
            n_fail += 1
            print(f"FAIL {name}: {exc!r}"[:500])
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
