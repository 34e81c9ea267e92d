"""Differential tests, wave 3: engine vs brute-force references for the
families waves 1-2 (test_differential_reference{,2}.py) did not reach.

Same charter (VERDICT r5 #2): every reference is a dict-and-loop
reimplementation of the DOCSTRING contract, deliberately NOT shaped
like the engine (no windows, no joins, no Catalyst folds, no shared
hash helpers from the package), so a structural bug shared by the
engine and its DuckDB oracle cannot survive the comparison.

Families here: repetition/boilerplate signals, decontamination,
embedding quantization, text canonicalization, histogram-sketch
quantiles (synthetic-input style); regression moments, TWAP,
encoding audit, CMS heavy hitters (sf0.001 real-parquet referees).
"""

from __future__ import annotations

import math
import random
import re
from collections import defaultdict
from datetime import timezone
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
P31 = 2147483647


def _poly(s: str) -> int:
    if not s:
        return 0
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % P31
    return h


def _mixed(s: str, salt: str) -> int:
    h = _poly(s + salt)
    return (h * h + h) % P31


def _toks_ref(text: str) -> list[str]:
    t = text.strip()
    return t.split()


def _epoch(dt) -> int:
    return math.floor(dt.replace(tzinfo=timezone.utc).timestamp())


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# repetition signals (Gopher boilerplate filters)
# ---------------------------------------------------------------------------


def _repetition_ref(docs):
    """Counter-based reimplementation of the docstring laws: duplicate
    token fraction and the top unigram/bigram mass."""
    want = {}
    for i, tx in docs:
        toks = _toks_ref(tx)
        n = len(toks)
        counts = defaultdict(int)
        for t in toks:
            counts[t] += 1
        nd = len(counts)
        top_tok = max(counts.values()) if counts else 0
        bigrams = [f"{toks[j]} {toks[j + 1]}" for j in range(n - 1)]
        bcounts = defaultdict(int)
        for b in bigrams:
            bcounts[b] += 1
        top_bg = max(bcounts.values()) if bcounts else 0
        want[i] = (
            n,
            nd,
            top_tok,
            top_bg,
            float(n - nd) / float(n) if n else 0.0,
            float(top_bg) / float(len(bigrams)) if bigrams else 0.0,
        )
    return want


@pytest.mark.parametrize("seed", [61])
def test_repetition_signals_matches_bruteforce(spark, seed):
    """Seeds the boundary shapes: whitespace-only text (ZERO tokens
    under the fixed tokenizer law), one-token docs (no bigrams -> ratio 0.0),
    a fully-repeated doc, and a bigram-dominated alternation."""
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        repetition_signals,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(8)]
    docs = [
        (0, "   "),
        (1, "solo"),
        (2, "x x x x x x"),
        (3, "a b a b a b a"),
        (4, "tab\tand\nnewline  runs"),
    ]
    for i in range(5, 45):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_distinct_tokens"],
            r["top_token_count"],
            r["top_bigram_count"],
            r["dup_token_ratio"],
            r["top_bigram_ratio"],
        )
        for r in repetition_signals(df, "text", "doc_id").collect()
    }
    assert got == _repetition_ref(docs)
    assert got[2][4] == pytest.approx(5.0 / 6.0)  # fully repeated doc
    assert got[1][5] == 0.0  # one token -> no bigrams


# ---------------------------------------------------------------------------
# decontamination (shared k-gram hashes vs an eval set)
# ---------------------------------------------------------------------------


def _shingle_set_ref(text: str, k: int) -> set[int]:
    """Docstring law: distinct polynomial hashes of every k-char
    window; texts shorter than k hash whole (one shingle)."""
    if len(text) >= k:
        return {_poly(text[j : j + k]) for j in range(len(text) - k + 1)}
    return {_poly(text)}


@pytest.mark.parametrize("seed", [62])
def test_decontaminate_matches_bruteforce(spark, seed):
    """Set-intersection referee over Python k-gram hash sets. Seeds:
    the leaked 9-gram at doc start / middle / end, a short (<9 chars)
    doc equal to a short benchmark doc, an empty corpus doc vs an
    empty benchmark doc (both hash to the single shingle 0 -> dropped),
    and clean docs sharing 8-char (sub-threshold) overlaps only."""
    from yandex_tracker_exporter_spark.operators.decontaminate import (
        contaminated_ids,
        decontaminate,
    )

    rng = random.Random(seed)
    bench = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "short"),
        (2, ""),
    ]
    corpus = [
        (10, "quick brown padding padding"),          # leak at start
        (11, "xxx the quick brown yyy"),              # leak mid-doc
        (12, "prefix Alazy dogZ"),                    # 8-char overlap only
        (13, "short"),                                # short == short bench doc
        (14, ""),                                     # empty == empty bench doc
        (15, "completely unrelated content here"),
    ]
    for i in range(16, 40):
        corpus.append((i, " ".join(rng.choice("abcdefg") * 3 for _ in range(6))))
    k = 9
    bench_hashes = set()
    for _, tx in bench:
        bench_hashes |= _shingle_set_ref(tx, k)
    want_bad = {
        i for i, tx in corpus if _shingle_set_ref(tx, k) & bench_hashes
    }
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got_bad = {
        r["doc_id"] for r in contaminated_ids(cdf, bdf, shingle_k=k).collect()
    }
    assert got_bad == want_bad
    assert {10, 11, 13, 14} <= got_bad and 12 not in got_bad
    got_clean = {
        r["doc_id"] for r in decontaminate(cdf, bdf, shingle_k=k).collect()
    }
    assert got_clean == {i for i, _ in corpus} - want_bad


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [63])
def test_quantize_embeddings_matches_bruteforce(spark, seed):
    """Per-element floor(x*scale+0.5) law with scale=127/max|v|. Seeds
    all-zero vectors (scale 0, all-zero codes), negative extrema, and
    exact .5 tie points where floor(+0.5) and round() diverge."""
    from yandex_tracker_exporter_spark.operators.similarity import (
        quantize_embeddings,
    )

    rng = random.Random(seed)
    vecs = [
        (0, [0.0, 0.0, 0.0]),
        (1, [2.0, 1.0, -1.0]),     # 1.0*63.5+0.5 = 64.0 exactly
        (2, [-4.0, 2.0, 3.0]),     # negative max-abs element
        (3, [1e-9, -1e-9, 1e-9]),
    ]
    for i in range(4, 40):
        vecs.append(
            (i, [rng.uniform(-3, 3) for _ in range(rng.randint(1, 8))])
        )
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["scale"], list(r["qvec"]))
        for r in quantize_embeddings(df, "embedding", "vec_id").collect()
    }
    want = {}
    for i, v in vecs:
        m = max(abs(x) for x in v)
        scale = 127.0 / m if m > 0.0 else 0.0
        want[i] = (scale, [int(math.floor(x * scale + 0.5)) for x in v])
    assert got == want
    assert got[0] == (0.0, [0, 0, 0])
    assert got[1][1] == [127, 64, -63]  # floor(-63.0) not round-half-even


# ---------------------------------------------------------------------------
# dedup-grade text canonicalization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [64])
def test_canonicalize_text_matches_bruteforce(spark, seed):
    """Lowercase -> explicit accent fold -> ASCII-whitespace collapse ->
    trim, reimplemented with str.lower / str.translate / re.sub. Seeds
    uppercase accents (folded only AFTER lowering), characters outside
    the fold table (must pass through), and tab/newline runs."""
    from yandex_tracker_exporter_spark.functions.text import (
        ACCENT_DST,
        ACCENT_SRC,
        canonicalize_text,
    )
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    fixtures = [
        (0, "Ángel  Café"),
        (1, "ÉÈÊË over\tthe\nlazy   dog"),
        (2, "  leading and trailing  "),
        (3, "ß stays ß — øut öf tàble çhars fold"),
        (4, ""),
        (5, "nø\tmixed\fwhitespace\rrüns\vhere"),
    ]
    pool = "AbÇdÉfgH ijklmnÑo\tpqrsßtÜvw\nxyzÅåØø  "
    for i in range(6, 40):
        fixtures.append(
            (i, "".join(rng.choice(pool) for _ in range(rng.randint(0, 60))))
        )
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    got = {
        r["doc_id"]: r["canon"]
        for r in df.select(
            "doc_id", canonicalize_text(F.col("text")).alias("canon")
        ).collect()
    }
    fold = str.maketrans(ACCENT_SRC, ACCENT_DST)
    want = {
        i: re.sub(r"[ \t\n\r\f\x0b]+", " ", tx.lower().translate(fold)).strip(" ")
        for i, tx in fixtures
    }
    assert got == want
    assert got[0] == "angel cafe"
    assert "ß" in got[3] and "o" in got[3]  # ø folds, ß passes through


# ---------------------------------------------------------------------------
# histogram-sketch quantiles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [65])
def test_histogram_quantiles_matches_bruteforce(spark, seed):
    """Order-statistic referee: the estimate must equal the lower edge
    of the bucket CONTAINING the ceil(q*n)-th smallest value — derived
    here by sorting the raw values, never by cumulating bucket counts
    like the engine does. Seeds values at exact bucket edges, at lo/hi,
    outside [lo, hi] (edge-bucket clamps), NaN/null (dropped), and a
    single-value group."""
    from pyspark.sql import functions as F
    from yandex_tracker_exporter_spark.operators.grouped import (
        histogram_quantiles,
    )

    rng = random.Random(seed)
    lo, hi, nb = 0.0, 100.0, 20
    width = (hi - lo) / nb
    rows = [
        ("edge", lo), ("edge", lo + width), ("edge", lo + 2 * width),
        ("edge", hi),                      # == hi clamps into last bucket
        ("clamp", -50.0), ("clamp", 500.0), ("clamp", 50.0),
        ("single", 42.0),
        ("nan", 10.0), ("nan", float("nan")), ("nan", 20.0), ("nan", None),
    ]
    for _ in range(300):
        rows.append(("bulk", rng.uniform(-10, 110)))
    df = spark.createDataFrame(rows, "grp string, value double")
    out = histogram_quantiles(
        df, "value", "grp", lo=lo, hi=hi, quantiles=(0.5, 0.95, 0.99),
        num_buckets=nb,
    )
    got = {
        r["grp"]: (r["n"], r["p50"], r["p95"], r["p99"]) for r in out.collect()
    }

    def bucket(v):
        return min(nb - 1, max(0, math.floor((v - lo) / width)))

    want = {}
    by_grp = defaultdict(list)
    for g, v in rows:
        if v is not None and not math.isnan(v):
            by_grp[g].append(v)
    for g, vals in by_grp.items():
        s = sorted(vals)
        ests = []
        for q in (0.5, 0.95, 0.99):
            k = math.ceil(q * len(s))
            ests.append(lo + bucket(s[k - 1]) * width)
        want[g] = (len(s), *ests)
    assert got == want
    assert got["nan"][0] == 2  # NaN and null rows dropped from n


# ---------------------------------------------------------------------------
# sf0.001 real-parquet referees
# ---------------------------------------------------------------------------


def _round_half_up(x: float) -> int:
    """Spark round(double): HALF_UP over the shortest decimal repr
    (BigDecimal.valueOf <-> Python repr), away from zero on ties."""
    return int(Decimal(repr(x)).to_integral_value(rounding=ROUND_HALF_UP))


def test_regression_stats_matches_bruteforce_sf(spark):
    """Five int64 moments accumulated with Python ints, then the
    slope/intercept/pearson double arithmetic replayed in the exact
    documented operand order — bit-equal floats."""
    orders = _fetch(
        f"SELECT o_custkey, o_totalprice FROM '{SF_DIR}/orders.parquet'"
    )
    cust = {
        ck: (bal, seg)
        for ck, bal, seg in _fetch(
            f"SELECT c_custkey, c_acctbal, c_mktsegment "
            f"FROM '{SF_DIR}/customer.parquet'"
        )
    }
    mom = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, sx, sy, sxy, sxx, syy
    for ck, price in orders:
        bal, seg = cust[ck]
        x, y = _round_half_up(bal), _round_half_up(price)
        m = mom[seg]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * y
        m[4] += x * x
        m[5] += y * y
    want = {}
    for seg, (ni, sxi, syi, sxyi, sxxi, syyi) in mom.items():
        n, sx, sy = float(ni), float(sxi), float(syi)
        sxy, sxx, syy = float(sxyi), float(sxxi), float(syyi)
        cov_n = n * sxy - sx * sy
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        slope = cov_n / var_x
        want[seg] = (
            ni,
            slope,
            (sy - slope * sx) / n,
            cov_n / math.sqrt(var_x * var_y),
        )
    got = {
        r["c_mktsegment"]: (
            r["n_orders"], r["slope"], r["intercept"], r["pearson_r"]
        )
        for r in entry.queries()["regression_stats"](spark, SF_DIR).collect()
    }
    assert got == want


def test_twap_matches_bruteforce_sf(spark):
    """Duration-weighted average law: each reading held until the
    user's NEXT event (open tails excluded), cents x seconds summed in
    Python ints per event type."""
    rows = _fetch(
        f"SELECT user_id, ts, event_id, event_type, value "
        f"FROM '{SF_DIR}/events.parquet'"
    )
    by_user = defaultdict(list)
    for uid, ts, eid, ty, v in rows:
        by_user[uid].append((_epoch(ts), eid, ty, math.floor(v * 100)))
    acc = defaultdict(lambda: [0, 0, 0])  # wsum, held, n
    for evs in by_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        for (ep, _, ty, cents), (ep2, _, _, _) in zip(evs, evs[1:]):
            dt = ep2 - ep
            a = acc[ty]
            a[0] += cents * dt
            a[1] += dt
            a[2] += 1
    want = {
        ty: (n, held, (wsum * 1000) // held)
        for ty, (wsum, held, n) in acc.items()
    }
    got = {
        r["event_type"]: (
            r["n_readings"], r["total_held_s"], r["twap_milli_cents"]
        )
        for r in entry.queries()["twap_by_type"](spark, SF_DIR).collect()
    }
    assert got == want
    assert all(w[0] >= 0 for w in acc.values()), "div/floor-div only agree >= 0"


def test_encoding_audit_matches_bruteforce_sf(spark):
    """Zigzag+varint byte law replayed with int.bit_length over the
    per-order delta streams (prev=0 at each order start)."""
    rows = _fetch(
        f"SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    )
    by_order = defaultdict(list)
    for ok, ln, pk, sk in rows:
        by_order[ok].append((ln, pk, sk, ok))
    cols = {"l_orderkey": 3, "l_partkey": 1, "l_suppkey": 2}
    tot = {c: [0, 0] for c in cols}  # n_values, varint_bytes
    for ok, items in by_order.items():
        items.sort()
        for col, idx in cols.items():
            prev = 0
            for it in items:
                v = it[idx]
                d = v - prev
                prev = v
                z = 2 * abs(d) - (1 if d < 0 else 0)
                bl = z.bit_length() if z else 1
                tot[col][0] += 1
                tot[col][1] += max(1, (bl + 6) // 7)
    want = {
        c: (n, n * 8, vb, (vb * 1000) // (n * 8)) for c, (n, vb) in tot.items()
    }
    got = {
        r["column_name"]: (
            r["n_values"], r["raw_bytes"], r["varint_bytes"], r["ratio_milli"]
        )
        for r in entry.queries()["encoding_audit"](spark, SF_DIR).collect()
    }
    assert got == want


def test_cms_heavy_hitters_matches_bruteforce_sf(spark):
    """Exact top-20 terms and their count-min estimates recomputed with
    dicts: counters[(d, mixed(term||':cms{d}') % 512)] summed over the
    DISTINCT-term counts, estimate = min over the 4 rows (missing
    bucket = 0). Verifies est >= exact structurally."""
    rows = _fetch(f"SELECT text FROM '{SF_DIR}/documents.parquet'")
    exact = defaultdict(int)
    for (tx,) in rows:
        for t in _toks_ref(tx):
            exact[t] += 1
    counters = defaultdict(int)
    for term, cnt in exact.items():
        for d in range(4):
            counters[(d, _mixed(term, f":cms{d}") % 512)] += cnt
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {}
    for term, cnt in top:
        est = min(counters.get((d, _mixed(term, f":cms{d}") % 512), 0)
                  for d in range(4))
        want[term] = (cnt, est, est - cnt)
    got = {
        r["term"]: (r["exact_cnt"], r["est_cnt"], r["overcount"])
        for r in entry.queries()["cms_heavy_hitters"](spark, SF_DIR).collect()
    }
    assert got == want
    assert all(est >= cnt for cnt, est, _ in want.values())
