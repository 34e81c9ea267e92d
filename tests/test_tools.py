"""Consistency checks for the repo-level tools: their query lists and
protocols must track the live contract, or their evidence goes stale
silently."""

import importlib.util
import os

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    path = os.path.join(REPO, "tools", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scale_check_subset_is_live_queries():
    """Every query the scale-growth tool times must exist in the
    contract — a rename would otherwise crash the tool mid-run after
    the expensive build phase."""
    sc = _load("scale_check")
    live = set(entry_mod.queries())
    missing = [q for q in sc.QUERY_SUBSET if q not in live]
    assert not missing, f"scale_check names dead queries: {missing}"


def test_scale_check_key_strides_cover_fact_tables():
    """The blow-up must shift every fact table's keys (dimensions stay
    single-copy); a new fact table added to the harness without a
    stride entry would silently produce key collisions."""
    sc = _load("scale_check")
    assert set(sc.KEY_SHIFTS) == {
        "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    }


def test_manifest_cell_normalizer_is_type_aware():
    """Numerically equal values must compare equal across engine return
    types (driver ADVICE r5: raw str() treated 0 vs 0.0 and Decimal vs
    float as mismatches), while real differences still mismatch."""
    import decimal

    mm = _load("make_manifest")
    assert mm._cell(0) == mm._cell(0.0) == mm._cell(decimal.Decimal("0"))
    assert mm._cell(1.5) == mm._cell(decimal.Decimal("1.5"))
    # bitwise-different but numerically-equal-at-12-sig-digit doubles
    assert mm._cell(0.1 + 0.2) == mm._cell(0.3)
    assert mm._cell(True) == "true" and mm._cell(False) == "false"
    assert mm._cell([1.0, 2]) == mm._cell([1, 2.0])
    assert mm._cell(float("nan")) == "NaN"
    assert mm._cell(1.0000001) != mm._cell(1.0000002)  # real diffs survive
    assert mm._cell(b"\x00\xff") == "00ff"
    # normalized grids sort columns by name and rows by value
    a = mm._norm([(1, 0.0), (2, 3.0)], ["k", "v"])
    b = mm._norm([(3.0, 2), (decimal.Decimal(0), 1)], ["V", "K"])
    assert a == b
    # result hash is stable over the normalized grid
    assert mm._result_md5(a, ["k", "v"]) == mm._result_md5(b, ["V", "K"])


def test_diff_manifest_classifies_changes():
    """Removed / downgraded / row-count / hash changes are breaking;
    added and upgraded queries are informational only."""
    dm = _load("diff_manifest")
    old = {
        "generated_utc": "t0",
        "queries": {
            "gone": {"status": "verified", "n_rows": 1, "result_md5": "a"},
            "down": {"status": "verified", "n_rows": 1, "result_md5": "b"},
            "rows": {"status": "verified", "n_rows": 5, "result_md5": "c"},
            "hash": {"status": "verified", "n_rows": 5, "result_md5": "d"},
            "same": {"status": "verified", "n_rows": 2, "result_md5": "e"},
            "up": {"status": "failed", "n_rows": None, "result_md5": None},
        },
    }
    new = {
        "generated_utc": "t1",
        "queries": {
            "down": {"status": "failed", "n_rows": 1, "result_md5": "b"},
            "rows": {"status": "verified", "n_rows": 6, "result_md5": "c2"},
            "hash": {"status": "verified", "n_rows": 5, "result_md5": "d2"},
            "same": {"status": "verified", "n_rows": 2, "result_md5": "e"},
            "up": {"status": "verified", "n_rows": 3, "result_md5": "f"},
            "new": {"status": "verified", "n_rows": 9, "result_md5": "g"},
        },
    }
    breaking, info = dm.diff(old, new)
    kinds = {line.split()[0] for line in breaking}
    assert kinds == {"REMOVED", "DOWNGRADE", "ROWCOUNT", "RESULT"}
    assert len(breaking) == 4  # 'same' and 'up' are not breaking
    assert any(line.startswith("ADDED") and "new" in line for line in info)
    assert any(line.startswith("UPGRADE") and "up" in line for line in info)
    # a rowcount change must not ALSO report as a hash change
    assert sum("rows" in line for line in breaking) == 1


def test_junk_smoke_cli_accepts_both_only_forms():
    """VERDICT r9 "What's wrong" #1: the docstring's ``--only q1,q2``
    space form crashed the round-9 hand parser with IndexError; both
    argparse forms (and --keep, and the positional sf_dir) must parse."""
    import pytest

    js = _load("junk_smoke")
    src, only, keep = js._parse_args(["--only", "q1,q2"])
    assert only == {"q1", "q2"}
    assert src == "/root/testdata/sf0.001" and keep is False
    _, only_eq, _ = js._parse_args(["--only=q1,q2"])
    assert only_eq == {"q1", "q2"}
    src2, only2, keep2 = js._parse_args(["/tmp/sfX", "--keep"])
    assert src2 == "/tmp/sfX" and only2 is None and keep2 is True
    _, trail, _ = js._parse_args(["--only", "q1,"])
    assert trail == {"q1"}  # trailing comma adds no empty name
    with pytest.raises(SystemExit):
        js._parse_args(["--bogus"])


def test_junk_check_cli_and_expected_movers():
    """junk_check shares the CLI contract and its EXPECTED_MOVERS
    allowlist entries (if any ever appear) must carry a reviewed,
    non-trivial explanation — an empty string would let movement
    through unadjudicated."""
    jc = _load("junk_check")
    src, only, keep, out = jc._parse_args([])
    assert src == "/root/testdata/sf0.001" and only is None and keep is False
    assert out.endswith("JUNKCHECK.json")
    for argv in (
        ["--only", "a,b", "--out", "/tmp/x.json"],
        ["--only=a,b", "--out=/tmp/x.json"],
    ):
        _, only2, _, out2 = jc._parse_args(argv)
        assert only2 == {"a", "b"} and out2 == "/tmp/x.json"
    for name, why in jc.EXPECTED_MOVERS.items():
        assert isinstance(name, str) and name
        assert isinstance(why, str) and len(why) > 20


def test_committed_junkcheck_has_no_unexplained_movers():
    """Ratchet on the committed movement artifact (VERDICT r9 #2):
    every contract query is adjudicated — junk-neutral, oracle-confirmed
    SQL participation, or documented — with zero UNEXPLAINED and zero
    ERROR. Regenerate with ``python tools/junk_check.py`` after an
    intentional junk-semantics change."""
    import json

    path = os.path.join(REPO, "JUNKCHECK.json")
    assert os.path.exists(path), "JUNKCHECK.json must be committed"
    art = json.load(open(path))
    assert art["counts"]["UNEXPLAINED"] == 0
    assert art["counts"]["ERROR"] == 0
    # round 10.5 ratchet: the oracle is replayed on junk for EVERY
    # oracle-bearing query (neutral ones included) — the SQL spec must
    # be TOTAL, reproducing the engine on junk input too
    assert art["counts"].get("NEUTRAL_ORACLE_DIVERGES", 0) == 0
    assert art["n_run"] == len(entry_mod.queries())
    for name, rec in art["queries"].items():
        assert rec["class"] in (
            "junk_neutral",
            "participates_as_sql",
            "expected_mover_documented",
        ), f"{name}: {rec['class']}"
        if rec.get("oracle"):
            assert rec.get("oracle_on_junk") == "match", (
                f"{name}: oracle_on_junk={rec.get('oracle_on_junk')}"
            )


def test_junk_smoke_rows_match_table_schemas():
    """Each injected junk row must have exactly the table's column
    count — a harness schema change would otherwise break the smoke
    tool at corpus-build time, silently invalidating its evidence."""
    import duckdb

    js = _load("junk_smoke")
    con = duckdb.connect()
    v2 = js._junk_rows_v2()
    for t in js.TABLES:
        cols = con.execute(
            "DESCRIBE SELECT * FROM read_parquet("
            f"'/root/testdata/sf0.001/{t}.parquet')"
        ).fetchall()
        if t == "embeddings":
            continue  # vector junk built in-code against the live schema
        for row in js.JUNK_ROWS[t] + v2[t] + js._junk_rows_v4().get(t, []):
            assert len(row) == len(cols), (t, row)
    # every non-dimension table carries at least one junk row
    assert set(js.JUNK_ROWS) == set(js.TABLES) - {"embeddings"}
    # the second wave covers every fact table with at least one
    # negative-id row (the trunc-% / floor-% divergence class)
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents"):
        assert any(
            isinstance(r[0], int) and r[0] < 0 for r in v2[t]
        ), f"{t} lacks a negative-id junk row"


def test_neardup_auto_scale_rejects_nonpositive_runs():
    """ADVICE r10: runs=0 used to surface as a NameError at the result
    dict (n_pairs/best bind inside the timing loop) — the guard turns
    it into a clear argument error before any Spark work starts."""
    import pytest

    mod = _load("neardup_auto_scale")
    for bad in (0, -1, "2", None):
        with pytest.raises(ValueError, match="runs"):
            mod.measure(None, "/nonexistent", bad)


def test_measurable_max_single_source_of_truth():
    """VERDICT r10 "What's wrong" #3: the ±1e15 magnitude rail used to
    be re-hardcoded as ~37 bare literals next to the named constant.
    Engine-side Column expressions now import funnel.MEASURABLE_MAX
    (zero `F.lit(1e15)` literals left); the oracle SQL strings must
    inline the TEXT `1e15` (plain strings, DuckDB-side), so this pin
    fails the moment the constant moves away from what the SQL says —
    forcing the oracles to move with it instead of drifting silently."""
    from yandex_tracker_exporter_spark.operators.funnel import (
        MEASURABLE_MAX,
    )

    assert MEASURABLE_MAX == float("1e15")

    for rel in (
        "__spark_entry__.py",
        "yandex_tracker_exporter_spark/operators/grouped.py",
        "yandex_tracker_exporter_spark/operators/temporal.py",
        "yandex_tracker_exporter_spark/operators/funnel.py",
    ):
        src = open(os.path.join(REPO, rel)).read()
        assert "F.lit(1e15)" not in src, f"{rel}: bare engine literal"


def test_bench_trust_gate_and_spread_stats():
    """VERDICT r10 #1: bench.py retries extra sweeps when the minima
    are untrusted. The gate itself is pure — pin its arithmetic:
    spread = second-best − best per query, p50/p90/max over those, and
    trusted ⟺ p90 ≤ 0.25 ∧ max ≤ 1.0."""
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = iu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    quiet = {f"q{i}": [1.0, 1.1, 1.05] for i in range(10)}
    assert bench._spread_stats(quiet) == (0.05, 0.05, 0.05)
    assert bench._minima_trusted(quiet)

    # a third quiet sample absorbs one wave hit (min + second-best both
    # quiet): exactly why extra retry sweeps can restore trust
    healed = dict(quiet)
    healed["q_wave"] = [1.0, 3.0, 1.01]
    assert bench._spread_stats(healed)[2] == 0.05  # q_wave's own is 0.01
    assert bench._minima_trusted(healed)

    # but a query whose TWO best samples disagree breaks the max gate
    wavy = dict(quiet)
    wavy["q_wave"] = [1.0, 3.0]
    p50, p90, mx = bench._spread_stats(wavy)
    assert mx == 2.0 and p50 == 0.05
    assert not bench._minima_trusted(wavy)

    # single-sample queries contribute no spread; empty is trusted
    assert bench._spread_stats({"q": [1.0]}) == (0.0, 0.0, 0.0)
    assert bench._minima_trusted({})


def test_media_wave4_expectations_cover_every_shape():
    """The wave-4 corpus and its expectation table must stay in sync:
    every (format, shape) the corpus generates has an allowed-class
    set, valid payloads expect ok, and every corruption shape expects a
    TYPED quarantine class (never ok — a corrupt payload that decodes
    is the fabrication class the probe exists to catch)."""
    jc = _load("junk_check")
    rows = jc.media_wave4_corpus()
    # 12 formats (8 wave-4 + 4 wave-5 widened-decode shapes) x 8
    # corruption shapes + the jpeg_prog scan bomb (ADVICE r11 rail)
    assert len(rows) == 97
    seen = set()
    for mid, fmt, shape, payload in rows:
        key = (fmt, shape)
        assert key in jc.MEDIA_WAVE4_EXPECT, key
        seen.add(key)
        allowed = jc.MEDIA_WAVE4_EXPECT[key]
        if shape == "valid":
            assert allowed == {"ok"} and payload
        else:
            assert "ok" not in allowed, key
    assert seen == set(jc.MEDIA_WAVE4_EXPECT)
    # deterministic ids: two builds agree row-for-row
    assert rows == jc.media_wave4_corpus()


def test_media_wave4_probe_is_green(spark):
    """Run the full wave-4/5 probe: all 97 payload shapes (12 formats
    incl. the r12 widened-decode variants, plus the scan bomb)
    classify as expected and every decode-backed operator is
    junk-neutral on the corrupt rows."""
    jc = _load("junk_check")
    sec = jc.run_media_wave4(spark)
    assert sec["unexplained"] == 0, {
        k: v for k, v in sec["rows"].items() if not v["ok"]
    }
    assert all(v["junk_neutral"] for v in sec["movement"].values())
    assert sec["movement"]["decode_media"]["fabricated_ids"] == []


def test_committed_junkcheck_has_media_wave4_section():
    """Ratchet extension (VERDICT r10 #2): the committed artifact must
    carry the wave-4 media section with zero unexplained rows — the
    DecodeCapExceeded/quarantine posture is PROVEN in the same artifact
    as the rest of the contract, not just claimed in docstrings."""
    import json

    art = json.load(open(os.path.join(REPO, "JUNKCHECK.json")))
    sec = art.get("media_wave4")
    assert sec is not None, "regenerate JUNKCHECK.json (wave 4 missing)"
    assert sec["unexplained"] == 0
    assert sec["n_rows"] == 97  # r12: scan bomb + 4 widened formats
    assert all(v["ok"] for v in sec["rows"].values())
    assert all(v["junk_neutral"] for v in sec["movement"].values())


def test_wav_parser_rejects_truncated_and_size_lying_chunks():
    """Junk wave 4's decoder finding: Python slice truncation let a WAV
    cut mid-data (or claiming a multi-GB data chunk) decode 'ok' with
    FABRICATED duration/checksum. Both shapes must quarantine as
    malformed now, and valid WAVs still decode."""
    import struct

    from yandex_tracker_exporter_spark import multimodal as mm

    p = mm.encode_wav(list(range(-100, 100)), 8000, 1)
    assert mm._decode_payload_verbose(p)[1] == "ok"
    assert mm._decode_payload_verbose(p[: int(len(p) * 0.6)])[1] == "malformed"
    lie = bytearray(p)
    i = p.find(b"data")
    lie[i + 4:i + 8] = struct.pack("<I", 0x7FFFFFF0)
    assert mm._decode_payload_verbose(bytes(lie))[1] == "malformed"


def test_bench_diff_classifies_deltas_by_spread():
    """bench_diff buckets per-query deltas against each run's OWN
    best-vs-second-best spread (falling back to the 0.05 s jitter
    floor), so a within-noise wobble never reads as a regression and a
    real move never hides behind a tight spread."""
    bd = _load("bench_diff")
    old = {
        "queries": {"a": 1.0, "b": 1.0, "c": 1.0, "gone": 9.0},
        "queries_spread": {"a": 0.02, "b": 0.02, "c": 0.5},
    }
    new = {
        "queries": {"a": 1.3, "b": 1.03, "c": 1.3, "fresh": 2.0},
        "queries_spread": {"a": 0.02, "b": 0.02, "c": 0.02},
    }
    out = bd.classify(old, new)
    assert [r[0] for r in out["slower"]] == ["a"]  # +0.3 > 0.05 floor
    assert [r[0] for r in out["within_noise"]] == ["b", "c"]
    # c's +0.3 is absorbed by ITS old-run spread of 0.5
    assert out["faster"] == []
    assert [r[0] for r in out["added"]] == ["fresh"]
    assert [r[0] for r in out["removed"]] == ["gone"]
    # driver-recorded artifacts nest under "parsed"
    assert bd._load.__name__ == "_load"


def test_committed_r11_bench_artifact_is_trusted():
    """Ratchet (VERDICT r10 #1): the committed round-11 bench artifact
    carries minima_trusted: true with the FULL per-query map — the
    cross-round baseline is evidentiary again."""
    import json

    art = json.load(open(os.path.join(REPO, "BENCH_r11_quiet.json")))
    assert art["minima_trusted"] is True
    assert art["n_queries"] == len(entry_mod.queries())
    assert len(art["queries"]) == art["n_queries"]  # FULL map, not compact
    assert art["task_failures"] == 0 and art["contended"] is False


def test_committed_r12_bench_artifact_is_trusted_with_caveat():
    """Round-12 ratchet: the committed quiet artifact is trusted, full
    map, and carries the median caveat IN the artifact (VERDICT r11
    #3) so no committed record invites a median-to-median cross-round
    comparison."""
    import json

    art = json.load(open(os.path.join(REPO, "BENCH_r12_quiet.json")))
    assert art["minima_trusted"] is True
    assert art["n_queries"] == len(entry_mod.queries())
    assert len(art["queries"]) == art["n_queries"]
    assert art["task_failures"] == 0 and art["contended"] is False
    assert "value_minima" in art["median_caveat"]


def test_schema_drift_check_cli_and_movers_contract():
    """schema_drift_check shares the probe-family CLI contract; any
    EXPECTED_SCHEMA_MOVERS entry must carry a reviewed explanation."""
    sd = _load("schema_drift_check")
    src, only, keep, out = sd._parse_args([])
    assert src == "/root/testdata/sf0.001" and only is None and not keep
    assert out.endswith("SCHEMADRIFT.json")
    _, only2, _, out2 = sd._parse_args(["--only=a,b", "--out=/tmp/x.json"])
    assert only2 == {"a", "b"} and out2 == "/tmp/x.json"
    assert sd.VARIANTS == ("reorder", "extra", "split", "debris")
    for (name, mode), why in sd.EXPECTED_SCHEMA_MOVERS.items():
        assert isinstance(name, str) and mode in sd.VARIANTS
        assert isinstance(why, str) and len(why) > 20


def test_committed_schemadrift_is_clean():
    """Ratchet on the committed layout-junk artifact (round 11): every
    contract query is drift-neutral across all three variants — the
    engine reads columns BY NAME, never by position, and never widens
    its projection implicitly when a producer appends a column."""
    import json

    path = os.path.join(REPO, "SCHEMADRIFT.json")
    assert os.path.exists(path), "SCHEMADRIFT.json must be committed"
    art = json.load(open(path))
    # VERDICT r11 #1: layout-junk evidence must run at the correctness
    # SF — sf0.01's extra row groups exercise footer-reconciliation
    # paths the sf0.001 corpus cannot (esp. the two-part-file variant)
    assert art["sf_dir"] == "/root/testdata/sf0.01"
    assert art["counts"]["UNEXPLAINED"] == 0
    assert art["counts"]["ERROR"] == 0
    assert art["n_run"] == len(entry_mod.queries())
    for name, rec in art["queries"].items():
        assert rec["class"] in (
            "drift_neutral",
            "expected_mover_documented",
        ), f"{name}: {rec}"


def test_tz_drift_check_cli_and_movers_contract():
    """tz_drift_check shares the probe-family CLI contract; any
    EXPECTED_TZ_MOVERS entry must carry a reviewed explanation, and
    the zone set must cover the three ambient-clock failure shapes
    (DST, non-hour offset, both)."""
    tz = _load("tz_drift_check")
    src, only, out = tz._parse_args([])
    assert src == "/root/testdata/sf0.01" and only is None
    assert out.endswith("TZCHECK.json")
    _, only2, out2 = tz._parse_args(["--only=a,b", "--out=/tmp/x.json"])
    assert only2 == {"a", "b"} and out2 == "/tmp/x.json"
    assert tz.ZONES == (
        "America/New_York", "Asia/Kathmandu", "Pacific/Chatham"
    )
    for (name, zone), why in tz.EXPECTED_TZ_MOVERS.items():
        assert isinstance(name, str) and zone in tz.ZONES
        assert isinstance(why, str) and len(why) > 20


def test_committed_tzcheck_is_clean():
    """Ratchet on the committed clock-junk artifact (round 12): every
    contract query is tz-neutral across all three hostile zones, the
    sweep ran at the correctness SF, and the UTC worker's fingerprints
    were cross-checked against the oracle-verified manifest."""
    import json

    path = os.path.join(REPO, "TZCHECK.json")
    assert os.path.exists(path), "TZCHECK.json must be committed"
    art = json.load(open(path))
    assert art["sf_dir"] == "/root/testdata/sf0.01"
    assert art["counts"]["UNEXPLAINED"] == 0
    assert art["counts"]["ERROR"] == 0
    assert art["manifest_cross_checked"] is True
    assert art["counts"]["manifest_match"] > 0
    assert art["n_run"] == len(entry_mod.queries())
    for name, rec in art["queries"].items():
        assert rec["class"] in (
            "tz_neutral",
            "expected_mover_documented",
        ), f"{name}: {rec}"
