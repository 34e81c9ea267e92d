"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` SQL on the
sf0.001 tables and compares row count, column names, and exact sorted
values — the same contract as CORRECTNESS_r{N}.json, but debuggable.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c] if not isinstance(row, tuple) else row[columns.index(c)]
            if isinstance(v, float):
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip(f"{name}: no oracle (rows-only check)")

    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(oracles[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"column mismatch: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_sorted = sorted(spark_rows, key=lambda t: tuple(str(x) for x in t))
    d_sorted = sorted(duck_rows, key=lambda t: tuple(str(x) for x in t))
    mismatches = []
    for i, (srow, drow) in enumerate(zip(s_sorted, d_sorted)):
        for j, (sv, dv) in enumerate(zip(srow, drow)):
            if isinstance(sv, float) and isinstance(dv, float):
                if not (
                    sv == dv or (math.isnan(sv) and math.isnan(dv))
                ):
                    mismatches.append((i, spark_cols[j], sv, dv, abs(sv - dv)))
            elif sv != dv:
                mismatches.append((i, spark_cols[j], sv, dv, None))
    assert not mismatches, f"{len(mismatches)} value mismatches, first 5: {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_an_oracle():
    """Contract invariant: no queries() entry ships without its DuckDB
    oracle (the weaker rows-only driver check is never the plan)."""
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    assert not missing, f"queries without oracles: {sorted(missing)}"


def test_manifest_matches_contract():
    """QUERIES_MANIFEST.json (the driver-protocol sweep evidence) must
    list exactly the live contract — a stale manifest is worse than
    none. Regenerate with tools/make_manifest.py after contract changes."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "QUERIES_MANIFEST.json")
    with open(path) as fh:
        manifest = json.load(fh)
    assert set(manifest["queries"]) == set(entry_mod.queries())
    bad = {
        k: v["status"]
        for k, v in manifest["queries"].items()
        if v["status"] not in ("verified", "no-oracle")
    }
    assert not bad, f"manifest records failures: {bad}"
