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

Full runs (no ``--only``) additionally execute the wave-4 MEDIA probe
(``run_media_wave4``): corrupted BINARY payloads — truncated magic,
valid-header-corrupt-body, zero-length, multi-GB-claiming containers,
byte soup, NULL — for all eight format variants (WAV/PPM/Y4M/PNG/
baseline JPEG/progressive JPEG/12-bit JPEG/MP4), adjudicated against a typed
expectation table plus a junk-neutrality fingerprint for every
decode-backed operator; the section lands in the artifact under
``media_wave4``.
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


# --------------------------------------------------------------------------
# Junk wave 4 (VERDICT r10 #2): corrupted BINARY payloads. The contract's
# media queries derive payloads deterministically from documents.text, so
# corrupt bytes cannot enter through the harness tables — the exposed
# surface is the DECODER-backed operator family itself. This probe feeds
# every real-decode operator a corpus of valid payloads for all six
# formats PLUS the verdict's corruption shapes, and adjudicates with the
# same two rules as the main probe:
#   1. classification — every corrupt payload must land in a TYPED
#      quarantine class (media_quarantine_report), in the class the
#      shape's physics implies; valid payloads must class "ok" (absent);
#   2. movement — every downstream operator's result on valid+corrupt
#      must be fingerprint-IDENTICAL to its result on valid-only
#      (junk-neutral: corrupt bytes contribute NOTHING, fabricate
#      nothing, crash nothing).
# --------------------------------------------------------------------------

#: per-(format, shape) allowed quarantine classes. "malformed" vs
#: "cap_exceeded" for the giant-claim shapes follows each parser's
#: physics: PNG/JPEG read dims from a FIXED-OFFSET header and hit the
#: allocation cap check (cap_exceeded, by POLICY); PPM/Y4M/WAV/MP4
#: validate declared size against actual bytes first, and a tiny body
#: claiming gigabytes IS a malformed container (no allocation happens
#: either way — pinned by tests/test_multimodal.py's memory-bomb test).
#: jpeg_prog / jpeg12 joined in round 11 when the decoder grew
#: progressive (SOF2) and 12-bit extended-sequential (SOF1) support —
#: the new scan machinery sits under the SAME adjudicated artifact.
#: wave 4 (r10) formats + the wave-5 (r12) widened-decode variants —
#: each widened shape (24-bit extensible WAV, 16-bit P5 graymap,
#: Adam7 palette PNG, C420 Y4M) gets the SAME full corruption-shape
#: battery as the original formats, so the format widenings are
#: adjudicated in the junk artifact, not just pinned in pytest
_W4_FORMATS = (
    "wav", "ppm", "y4m", "png", "jpeg", "jpeg_prog", "jpeg12", "mp4",
    "wav24", "pgm16", "png_i", "y4m420",
)

MEDIA_WAVE4_EXPECT: dict[tuple[str, str], set] = {
    **{(f, "valid"): {"ok"} for f in _W4_FORMATS},
    **{(f, "null_payload"): {"null_payload"} for f in _W4_FORMATS},
    **{(f, "zero_length"): {"unknown_format"} for f in _W4_FORMATS},
    **{(f, "truncated_magic"): {"unknown_format"} for f in _W4_FORMATS},
    **{(f, "byte_soup"): {"unknown_format"} for f in _W4_FORMATS},
    # valid magic, body cut to 60% — strict-length/CRC checks must fire
    # (the WAV parser FABRICATED duration/checksum from truncated data
    # until this wave: silent slice truncation in the chunk walk)
    **{(f, "truncated_body"): {"malformed"} for f in _W4_FORMATS},
    # structural corruption mid-body (bit flip / size-field lie)
    **{(f, "body_corrupt"): {"malformed"} for f in _W4_FORMATS},
    # header claims multi-GB content over a tiny body. The class split
    # is structural: strict-length formats (WAV/PNM/Y4M/MP4) fail the
    # payload-slice check -> malformed; PNG/JPEG validate dimensions
    # BEFORE touching compressed data -> cap_exceeded
    ("wav", "giant_claim"): {"malformed"},
    ("ppm", "giant_claim"): {"malformed"},
    ("y4m", "giant_claim"): {"malformed"},
    ("mp4", "giant_claim"): {"malformed"},
    ("png", "giant_claim"): {"cap_exceeded"},
    ("jpeg", "giant_claim"): {"cap_exceeded"},
    ("jpeg_prog", "giant_claim"): {"cap_exceeded"},
    ("jpeg12", "giant_claim"): {"cap_exceeded"},
    ("wav24", "giant_claim"): {"malformed"},
    ("pgm16", "giant_claim"): {"malformed"},
    ("png_i", "giant_claim"): {"cap_exceeded"},
    ("y4m420", "giant_claim"): {"malformed"},
    # ADVICE r11 (medium): a stream of tiny EOB-run scans — each scan
    # walks the full block grid for ~12 payload bytes; the scan-count
    # rail must quarantine it as a typed malformed, not stall the
    # executor (decode used to SUCCEED, so no handler ever fired)
    ("jpeg_prog", "scan_bomb"): {"malformed"},
}


def media_wave4_corpus() -> list[tuple[int, str, str, bytes | None]]:
    """(media_id, format, shape, payload) rows: one valid payload per
    format plus every corruption shape, all deterministic."""
    import struct

    import numpy as np

    from yandex_tracker_exporter_spark import multimodal as mm

    valid = {
        "wav": mm.encode_wav(list(range(-100, 100)), 8000, 1),
        "ppm": mm.encode_ppm(4, 4, bytes(range(48))),
        "y4m": mm.encode_y4m(4, 4, [bytes(range(48))] * 2),
        "png": mm.encode_png(4, 5, bytes(range(60))),
        "jpeg": mm.encode_jpeg_gray(8, 8, bytes(range(64))),
        "jpeg_prog": mm.encode_jpeg_gray_progressive(
            16, 16, bytes((i * 7) % 256 for i in range(256))
        ),
        "jpeg12": mm.encode_jpeg_gray12(8, 8, [(i * 64) % 4096 for i in range(64)]),
        "mp4": mm.encode_mp4_meta(640, 480, 1500),
        # wave 5 (r12): the widened-decode shapes as first-class formats
        "wav24": mm.encode_wav_ex(
            [((i * 9001) % (1 << 24)) - (1 << 23) for i in range(120)],
            8000, 1, bits=24, extensible=True,
        ),
        "pgm16": b"P5\n5 4\n65535\n" + struct.pack(
            ">20H", *[(i * 3001) % 65536 for i in range(20)]
        ),
        "png_i": mm.encode_png_ex(
            9, 7, [(i * 5) % 4 for i in range(63)], color_type=3,
            bit_depth=2, interlace=1,
            palette=[(10, 20, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3)],
        ),
        "y4m420": mm.encode_y4m(
            6, 4, [bytes((i * 13 + f) % 256 for i in range(36))
                   for f in range(2)],
            colorspace="C420",
        ),
    }
    magic_keep = {"wav": 3, "ppm": 1, "y4m": 4, "png": 5, "jpeg": 1,
                  "jpeg_prog": 1, "jpeg12": 1, "mp4": 6,
                  "wav24": 3, "pgm16": 1, "png_i": 5, "y4m420": 4}

    def body_corrupt(fmt: str, p: bytes) -> bytes:
        b = bytearray(p)
        if fmt in ("wav", "wav24"):  # data chunk size lies past payload
            i = p.find(b"data")
            b[i + 4:i + 8] = struct.pack("<I", 0x7FFFFFF0)
        elif fmt == "pgm16":  # one raster byte chopped (odd 16-bit cut)
            b = b[:-1]
        elif fmt == "png_i":  # flip a byte inside the IDAT body: CRC
            i = p.find(b"IDAT")
            b[i + 6] ^= 0xFF
        elif fmt == "y4m420":  # final frame body cut
            b = b[:-5]
        elif fmt == "ppm":  # one raster byte chopped: strict-length breach
            b = b[:-1]
        elif fmt == "y4m":  # final frame body cut: checksummed length breach
            b = b[:-5]
        elif fmt == "png":  # IDAT bit flip: CRC mismatch
            b[45] ^= 0xFF
        elif fmt in ("jpeg", "jpeg_prog"):  # entropy bit flip
            b[len(b) // 2] ^= 0xFF
        elif fmt == "jpeg12":
            # the payload midpoint falls inside the 16-bit DQT, and a
            # corrupted quant table DECODES (JPEG carries no integrity
            # check — that is honest lossy corruption, not fabrication);
            # corrupt the SOS band instead: Se=7 on a sequential scan
            # is structurally illegal and must quarantine
            i = p.find(b"\xff\xda")
            (sos_len,) = struct.unpack(">H", p[i + 2:i + 4])
            b[i + 2 + sos_len - 2] = 7  # Se byte of the SOS header
        elif fmt == "mp4":  # ftyp box size lie
            b[0:4] = struct.pack(">I", 2**31)
        return bytes(b)

    def giant_claim(fmt: str, p: bytes) -> bytes:
        if fmt in ("wav", "wav24"):
            return body_corrupt(fmt, p)  # multi-GB data chunk claim
        if fmt == "ppm":
            return b"P6\n60000 60000\n255\n" + b"\x00" * 10
        if fmt == "pgm16":
            return b"P5\n60000 60000\n65535\n" + b"\x00" * 10
        if fmt == "png_i":
            # IHDR claims 50000x50000 palette Adam7 over a 2-byte IDAT
            ihdr = struct.pack(">IIBBBBB", 50000, 50000, 2, 3, 0, 0, 1)
            return (
                mm.PNG_SIG
                + mm._png_chunk(b"IHDR", ihdr)
                + mm._png_chunk(b"PLTE", bytes(12))
                + mm._png_chunk(b"IDAT", b"xx")
                + mm._png_chunk(b"IEND", b"")
            )
        if fmt in ("y4m", "y4m420"):
            return b"YUV4MPEG2 W60000 H60000 F25:1\nFRAME\n" + b"\x00" * 10
        if fmt == "png":  # IHDR claims 50000x50000 over a 2-byte IDAT
            ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0)
            return (
                mm.PNG_SIG
                + mm._png_chunk(b"IHDR", ihdr)
                + mm._png_chunk(b"IDAT", b"xx")
                + mm._png_chunk(b"IEND", b"")
            )
        if fmt in ("jpeg", "jpeg_prog", "jpeg12"):  # SOF dims -> 60000^2
            b = bytearray(p)
            sof = {"jpeg": b"\xff\xc0", "jpeg_prog": b"\xff\xc2",
                   "jpeg12": b"\xff\xc1"}[fmt]
            i = p.find(sof)
            b[i + 5:i + 9] = struct.pack(">HH", 60000, 60000)
            return bytes(b)
        # mp4: 64-bit largesize box claiming more than the file holds
        return struct.pack(">I", 1) + b"ftyp" + b"\x00" * 4

    soup = bytes((i * 37 + 11) % 256 for i in range(64))
    rows: list[tuple[int, str, str, bytes | None]] = []
    mid = 0
    for fmt, p in sorted(valid.items()):
        shapes = {
            "valid": p,
            "null_payload": None,
            "zero_length": b"",
            "truncated_magic": p[: magic_keep[fmt]],
            "byte_soup": soup,
            "truncated_body": p[: int(len(p) * 0.6)],
            "body_corrupt": body_corrupt(fmt, p),
            "giant_claim": giant_claim(fmt, p),
        }
        if fmt == "jpeg_prog":
            # 100 scans: over the 1-component cap of 14 + 64; the
            # builder is shared with the pytest pin (r12 review —
            # a second hand-rolled copy would drift silently)
            shapes["scan_bomb"] = mm.encode_jpeg_eob_scan_stream(100)
        for shape, payload in sorted(shapes.items()):
            rows.append((mid, fmt, shape, payload))
            mid += 1
    # keep numpy referenced: encoders return plain bytes but the import
    # is part of the probe's documented dependency surface
    assert np is not None
    return rows


def run_media_wave4(spark) -> dict:
    """Execute the wave-4 probe; returns the artifact section."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from yandex_tracker_exporter_spark import multimodal as mm

    rows = media_wave4_corpus()
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("shape", StringType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    kind_of = {"wav": "audio", "ppm": "image", "y4m": "video",
               "png": "image", "jpeg": "image", "jpeg_prog": "image",
               "jpeg12": "image", "mp4": "video", "wav24": "audio",
               "pgm16": "image", "png_i": "image", "y4m420": "video"}
    df = spark.createDataFrame(
        [(mid, kind_of[fmt], f"{fmt}:{shape}", p) for mid, fmt, shape, p in rows],
        schema,
    ).cache()
    meta = {mid: (fmt, shape) for mid, fmt, shape, _ in rows}

    # 1. classification: every row lands in its expected class
    got = {
        r["media_id"]: r["reason_class"]
        for r in mm.media_quarantine_report(df).collect()
    }
    section: dict = {"rows": {}, "unexplained": 0, "n_rows": len(rows)}
    for mid, (fmt, shape) in sorted(meta.items()):
        actual = got.get(mid, "ok")
        allowed = MEDIA_WAVE4_EXPECT[(fmt, shape)]
        ok = actual in allowed
        section["rows"][f"{fmt}:{shape}"] = {
            "class": actual,
            "expected": sorted(allowed),
            "ok": ok,
        }
        if not ok:
            section["unexplained"] += 1

    # 2. movement: the FEATURE operators skip quarantined payloads, so
    # valid-only vs valid+corrupt must fingerprint equal (junk-neutral)
    valid_df = df.where(F.col("shape").endswith(":valid"))
    valid_ids = {mid for mid, (_, shape) in meta.items() if shape == "valid"}
    ops = {
        "audio_frame_energy": mm.audio_frame_energy,
        "image_channel_histogram": mm.image_channel_histogram,
        "resize_images": mm.resize_images,
    }
    section["movement"] = {}
    for op_name, op in sorted(ops.items()):
        full = _fingerprint_df(op(df))
        clean = _fingerprint_df(op(valid_df))
        neutral = full == clean
        section["movement"][op_name] = {
            "junk_neutral": neutral,
            "n_rows_valid_only": clean[0],
            "n_rows_with_junk": full[0],
        }
        if not neutral:
            section["unexplained"] += 1

    # decode_media's CONTRACT is one row per input (header fields or
    # nulls), so junk rows legitimately appear — the adjudication is
    # that they appear ONLY as all-null-field rows (nothing fabricated)
    # and the valid rows are byte-identical to a valid-only run
    decoded = mm.decode_media(df).cache()
    valid_part = _fingerprint_df(
        decoded.where(F.col("media_id").isin(sorted(valid_ids)))
    )
    clean_run = _fingerprint_df(mm.decode_media(valid_df))
    junk_rows = decoded.where(
        ~F.col("media_id").isin(sorted(valid_ids))
    ).collect()
    fabricated = [
        r["media_id"]
        for r in junk_rows
        if any(r[c] is not None for c in decoded.columns if c != "media_id")
    ]
    dm_ok = valid_part == clean_run and not fabricated
    section["movement"]["decode_media"] = {
        "junk_neutral": dm_ok,
        "rule": "junk rows emit all-null fields; valid rows byte-identical",
        "n_rows_valid_only": clean_run[0],
        "n_rows_with_junk": valid_part[0] + len(junk_rows),
        "fabricated_ids": fabricated,
    }
    if not dm_ok:
        section["unexplained"] += 1
    decoded.unpersist()
    df.unpersist()
    return section


def _fingerprint_df(sdf) -> tuple[int, list, str]:
    rows = [tuple(r) for r in sdf.collect()]
    cols = list(sdf.columns)
    norm = _norm(rows, cols)
    return len(rows), sorted(c.lower() for c in cols), _result_md5(norm, cols)


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

    # wave 4 (always on for full runs; skipped under --only so targeted
    # replays stay targeted)
    media_wave4 = None
    if only is None:
        media_wave4 = run_media_wave4(spark)
        print(
            f"media_wave4: {media_wave4['n_rows']} payload shapes, "
            f"{media_wave4['unexplained']} unexplained; movement "
            + ", ".join(
                f"{k}={'neutral' if v['junk_neutral'] else 'MOVED'}"
                for k, v in media_wave4["movement"].items()
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
    if media_wave4 is not None:
        artifact["media_wave4"] = media_wave4
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    bad = (
        counts["UNEXPLAINED"]
        + counts["ERROR"]
        + counts["NEUTRAL_ORACLE_DIVERGES"]
        + (media_wave4["unexplained"] if media_wave4 else 0)
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
