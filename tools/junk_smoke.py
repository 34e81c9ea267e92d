"""Junk-corpus smoke: run EVERY contract query against a clone of the
harness tables with injected junk rows, and report crashes.

The round-8/9 latent-input probes (dedup/similarity, funnel, graph,
streaming, stats) each hand-picked one family and found bug classes of
the shape "one junk row corrupts or kills real results". This tool
industrializes the CRASH half of that probe over the whole 151-query
surface: a 100 TB corpus ingested from real feeds WILL contain null
keys, NaT timestamps, NaN measurements, empty/whitespace text, empty
and ragged embedding vectors — a query that dies on any one of them is
not scale-ready, no matter what its plan shape says.

Scope note: result MOVEMENT under junk is deliberately out of scope
here — whether a junk row legitimately changes an aggregate is a
per-operator semantics question (the hand probes adjudicate those);
a Python exception, an ANSI cast error, or a crashed Arrow worker is
unambiguous.

Usage::

    python tools/junk_smoke.py [SF_DIR] [--only q1,q2] [--keep]

Builds the junk clone under /tmp/junk_smoke_sf (deterministic content,
rebuilt each run), runs each query under a bare SparkSession (driver
protocol: ANSI on, default confs), prints one line per query and a
JSON summary. Exit 1 when any query crashes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

NAN = float("nan")

#: per-table junk rows (column order matches the harness parquet).
#: Shapes: NULL keys / timestamps, NaN doubles, empty + whitespace
#: strings, empty / ragged / non-finite vectors. Ids are huge so junk
#: never collides with real keys.
JUNK_ROWS: dict[str, list[tuple]] = {
    "region": [(None, None), (990001, "")],
    "nation": [(None, "", None), (990001, None, None)],
    "customer": [
        (None, None, None, NAN, None),
        (9900001, "", None, None, " "),
    ],
    "supplier": [(None, None, None, NAN), (9900001, "", None, None)],
    "part": [
        (None, None, None, None, None, NAN),
        (9900001, "", " ", "", None, None),
    ],
    "orders": [
        (None, None, None, NAN, None, None),
        (99000001, None, "", None, None, " "),
    ],
    "lineitem": [
        (None, None, None, None, NAN, NAN, NAN, NAN, None, None, None),
        (99000001, None, None, None, None, None, None, None, "", " ", None),
    ],
    "events": [
        (None, None, None, None, NAN, None),
        (99000001, None, None, "", None, ""),
    ],
    "documents": [
        (None, None, None, None, None),
        (99000001, "", "", "", 0),
        (99000002, "   \n\t  ", None, " ", 8),
    ],
    # embeddings junk is injected separately (vector shapes need the
    # array type): NULL vector, empty vector, ragged short vector,
    # NaN element, Inf element, zero vector.
}

#: round-10 second wave — shapes the NULL/NaN wave cannot represent:
#: NEGATIVE ids (trunc-% goes negative: element_at(arr, 0) raises under
#: ANSI; salted hashes must agree on sign), DUPLICATE primary keys
#: (latest-wins and grouping semantics), non-ASCII text (codepoint
#: folds must agree beyond ASCII), out-of-band timestamps (epoch
#: arithmetic, densification spans), malformed and int64-OVERFLOWING
#: JSON (ANSI CAST of '99999999999999999999' raises), and -0.0.
#: Timestamps are datetime objects (the column is a real TIMESTAMP).
def _junk_rows_v2() -> dict[str, list[tuple]]:
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    uni = "héllo wörld 🎉 ñaïve café héllo wörld"
    return {
        "region": [],
        "nation": [],
        "customer": [
            (-9800001, "Customer#negative", -2, -50.25, "AUTOMOBILE"),
            (9800010, "Customer#huge", 3, 1e308, "BUILDING"),  # wave 3
        ],
        "supplier": [
            (-9800001, "Supplier#negative", -2, -10.5),
            (9800010, "Supplier#huge", 3, -1e308),  # wave 3
        ],
        "part": [(-9800001, "negative part", "Brand#00", "TYPE X", -1, 1.99)],
        "orders": [
            (-98000001, -5, "O", 123.45, t("1996-03-15 00:00:00"), "3-MEDIUM"),
            # wave 3: extreme price (custkey matches no customer, so
            # join queries stay neutral; group-first queries must rail)
            (98000010, 98000010, "F", 1e308, t("1996-06-01 00:00:00"), "1-URGENT"),
        ],
        "lineitem": [
            (
                -98000001, -5, -3, -1, 2.0, 150.0, 0.05, 0.02,
                "N", "O", t("1995-06-10 00:00:00"),
            ),
            # wave 3: extreme price landing in REAL (returnflag,
            # linestatus) groups — the TPC-H Q1 decimal sums must rail
            (
                98000010, 98000010, 98000010, 1, 1.0, 1e308, 0.0, 0.0,
                "N", "O", t("1995-07-01 00:00:00"),
            ),
        ],
        "events": [
            # wave 3: finite-but-extreme magnitudes — CAST(1e308 AS
            # DECIMAL) raises under ANSI, floor(1e308*100) silently
            # saturates to Long.MAX (then int64 sums overflow-crash)
            (98000010, t("2024-01-12 12:00:00"), 98000010, "view", 1e308, '{"k": 5}'),
            (98000011, t("2024-01-13 13:00:00"), 98000011, "purchase", -1e20, '{"k": 6}'),
            (-98000001, t("2024-01-10 08:00:00"), -7, "view", 3.5, '{"k": 2}'),
            (98000002, t("2023-12-01 00:30:00"), 98000002, "click", 1.25, "{bad json"),
            (
                98000003, t("2024-02-15 09:00:00"), 98000003, "signup",
                2.5, '{"k": 99999999999999999999}',
            ),
            (
                98000004, t("2024-01-20 10:00:00"), 98000004, "view",
                -0.0, '{"k": "notanint"}',
            ),
            # duplicate primary key, two different payloads
            (98000005, t("2024-01-21 10:00:00"), 98000005, "view", 1.0, '{"k": 3}'),
            (98000005, t("2024-01-21 11:00:00"), 98000005, "purchase", 2.0, '{"k": 4}'),
        ],
        "documents": [
            (-98000001, "negative id doc with several plain words", "en", "web", 40),
            (98000002, uni, "xx", "web", len(uni)),
        ],
    }


#: round-11 fourth wave — ENCODING junk in documents.text (VERDICT r10
#: #2). The media fixture builders encode text CODEPOINTS into real
#: WAV/PPM/PNG payloads and the text operators fold codepoints into
#: hashes/shingles, so mojibake-grade text is the table-level entry
#: point for binary-adjacent junk: embedded NULs, BOM + bidi override
#: controls, Unicode NONCHARACTERS (U+FFFE/U+FFFF), the max astral
#: codepoint, C1 controls, and a lone replacement char. (True invalid
#: UTF-8 BYTES cannot exist in a Spark string — the decoder-level
#: corruption shapes live in tools/junk_check.py's media_wave4 probe.)
def _junk_rows_v4() -> dict[str, list[tuple]]:
    return {
        "documents": [
            (98000101, "\x00abc\x00def words here\x00", "en", "web", 12),
            (
                98000102,
                "\ufeff\u202evil bidi\u202c tail text",
                "xx",
                "web",
                9,
            ),
            (
                98000103,
                "\U0010ffff\ufffe\uffff mixed astral \U0001f600 doc",
                None,
                "crawl",
                11,
            ),
            (
                98000104,
                "\x85\x9c c1 controls � lone replacement",
                "en",
                "pdf",
                7,
            ),
        ],
    }


def build_junk_corpus(spark, src_dir: str, dst_dir: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if os.path.exists(dst_dir):
        shutil.rmtree(dst_dir)
    os.makedirs(dst_dir)
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        # everything nullable so the junk rows union cleanly
        schema = T.StructType(
            [
                T.StructField(f.name, f.dataType, True)
                for f in df.schema.fields
            ]
        )
        if t == "embeddings":
            dim = len(df.select("embedding").first()[0])
            junk = [
                (99000001, None, None),
                (99000002, [], 0),
                (99000003, [1.0, 2.0], None),  # ragged
                (99000004, [NAN] * dim, 0),
                (99000005, [float("inf")] * dim, 0),
                (99000006, [0.0] * dim, 0),
                # wave 2: negative id; finite-huge elements whose
                # norm-of-squares overflows to Inf (quarantine must
                # catch the OVERFLOWING fold, not just Inf elements);
                # denormal elements
                (-98000001, [0.25] * dim, -1),
                (98000007, [1e200] * dim, 3),
                (98000008, [5e-324] * dim, 2),
            ]
        else:
            junk = (
                JUNK_ROWS[t]
                + _junk_rows_v2()[t]
                + _junk_rows_v4().get(t, [])
            )
        junk_df = spark.createDataFrame(junk, schema)
        out = df.unionByName(junk_df)
        # single file per table, same layout as the harness
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{t}.parquet")
        )


def _parse_args(argv: list[str]):
    """CLI contract (VERDICT r9 "What's wrong" #1): the docstring's
    space form ``--only q1,q2`` used to crash with IndexError because
    the hand parser only accepted ``--only=q1,q2``. argparse accepts
    both forms (and keeps ``--keep`` honest too)."""
    import argparse

    p = argparse.ArgumentParser(
        prog="junk_smoke", description=__doc__.splitlines()[0]
    )
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    p.add_argument(
        "--only",
        default=None,
        help="comma-separated query names (both --only q1,q2 and --only=q1,q2)",
    )
    p.add_argument(
        "--keep",
        action="store_true",
        help="keep the junk clone under /tmp/junk_smoke_sf after the run",
    )
    a = p.parse_args(argv)
    only = set(x for x in a.only.split(",") if x) if a.only else None
    return a.sf_dir, only, a.keep


def main() -> int:
    src, only, keep = _parse_args(sys.argv[1:])
    dst = "/tmp/junk_smoke_sf"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    build_junk_corpus(spark, src, dst)
    print(f"junk corpus built at {dst} from {src}", flush=True)

    import __spark_entry__ as entry

    qs = entry.queries()
    crashed: dict[str, str] = {}
    n_run = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        n_run += 1
        try:
            fn(spark, dst).collect()
            print(f"{name} OK", flush=True)
        except Exception as exc:  # noqa: BLE001 — the point is the report
            msg = f"{type(exc).__name__}: {str(exc)[:300]}"
            crashed[name] = msg
            print(f"{name} CRASH {msg}", flush=True)
    print(
        json.dumps(
            {"src": src, "n_run": n_run, "n_crashed": len(crashed), "crashed": crashed}
        )
    )
    if not keep:
        shutil.rmtree(dst, ignore_errors=True)
    return 1 if crashed else 0


if __name__ == "__main__":
    raise SystemExit(main())
