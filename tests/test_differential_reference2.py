"""Differential tests, wave 2: engine vs brute-force references for the
families the round-6 first wave did not reach.

Same charter as test_differential_reference.py (VERDICT r5 #2): every
reference here is a dict-and-loop reimplementation of the DOCSTRING
contract, deliberately NOT shaped like the engine (no windows, no
joins, no Catalyst folds), so a structural bug shared by engine and
DuckDB oracle cannot survive the comparison.

Two referee styles:
- synthetic-input operator tests (the wave-1 style) for the sampling /
  scoring / sketch-merge operators;
- sf0.001 real-parquet referees for contract queries whose logic lives
  inline in ``__spark_entry__.py``: the reference recomputes the result
  in pure Python from the SAME parquet files (read via duckdb, no
  Spark), covering the full load→transform path.
"""

from __future__ import annotations

import math
import random
from collections import defaultdict
from datetime import timezone

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


def _toks_ref(text):
    t = text.strip()
    return t.split()


def _epoch(dt) -> int:
    """Floored epoch seconds of a naive (UTC-pinned) timestamp — the
    repo's NOTES rule (floor, never round)."""
    return math.floor(dt.replace(tzinfo=timezone.utc).timestamp())


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _pct_type7(xs, p):
    """Exact linearly-interpolated percentile (R type 7) in the precise
    operation order Spark's ``Percentile`` (and DuckDB
    ``quantile_cont``) use: the TWO-WEIGHT form
    ``(hi−pos)·x[lo] + (pos−lo)·x[hi]`` — NOT ``x[lo] + frac·Δ``,
    which differs by an ulp on some inputs (found by this test: Spark
    324616.0 vs 324615.99999999994)."""
    s = sorted(xs)
    pos = (len(s) - 1) * p
    lo = math.floor(pos)
    hi = math.ceil(pos)
    if lo == hi:
        return float(s[lo])
    return (hi - pos) * s[lo] + (pos - lo) * s[hi]


# ---------------------------------------------------------------------------
# sampling family (hash_sample / split_assign / stratified_sample)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [41])
def test_hash_sample_matches_bruteforce(spark, seed):
    """Membership is literally mixed_hash(key||'sample:') % 100 < 10 — the
    referee evaluates that predicate per key with a character loop."""
    from yandex_tracker_exporter_spark.operators.text_analysis import hash_sample

    rng = random.Random(seed)
    ids = rng.sample(range(10**9), 400) + [0, 1, 10**9]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["sample_bucket"]
        for r in hash_sample(df, "doc_id", buckets=100, keep=10).collect()
    }
    want = {
        i: _mixed(str(i), "sample:") % 100
        for i in ids
        if _mixed(str(i), "sample:") % 100 < 10
    }
    assert got == want
    assert got, "fixture must select a non-empty sample"


@pytest.mark.parametrize("seed", [42])
def test_split_assign_matches_bruteforce(spark, seed):
    from yandex_tracker_exporter_spark.operators.text_analysis import split_assign

    rng = random.Random(seed)
    ids = rng.sample(range(10**7), 300)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id").collect()}

    def ref(i):
        b = _mixed(str(i), "split:") % 100
        return "train" if b < 90 else ("val" if b < 95 else "test")

    assert got == {i: ref(i) for i in ids}
    assert set(got.values()) == {"train", "val", "test"}


@pytest.mark.parametrize("seed", [43])
def test_stratified_sample_matches_bruteforce(spark, seed):
    """Copy-count law: floor(rate) guaranteed copies plus one iff the
    salted bucket < round(frac(rate)*buckets). Covers rate>1 (two
    epochs), rate<1 (quarter), the default 1.0, and rate 0 (drop)."""
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        stratified_sample,
    )

    rng = random.Random(seed)
    langs = ["en", "de", "zh", "fr", "xx"]
    rows = [(i, rng.choice(langs)) for i in rng.sample(range(10**6), 500)]
    rates = {"en": 0.5, "de": 2.0, "zh": 0.25, "xx": 0.0}
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        (r["doc_id"], r["lang"], r["copy_idx"])
        for r in stratified_sample(
            df, "lang", rates, default_rate=1.0, key_col="doc_id", buckets=1000
        ).collect()
    )
    want = []
    for i, lang in rows:
        r = rates.get(lang, 1.0)
        whole = int(r)
        frac_buckets = round((r - whole) * 1000)
        bucket = _mixed(str(i), "mix:") % 1000
        n = whole + (1 if bucket < frac_buckets else 0)
        want += [(i, lang, c) for c in range(n)]
    assert got == sorted(want)
    by_lang = defaultdict(int)
    for _, lang, _ in got:
        by_lang[lang] += 1
    assert by_lang["xx"] == 0, "rate 0 must drop the group entirely"
    n_de = sum(1 for _, lang in rows if lang == "de")
    assert by_lang["de"] == 2 * n_de, "rate 2.0 = exactly two epochs"


# ---------------------------------------------------------------------------
# scoring family (tfidf_top_terms / lm_doc_score / length_buckets)
# ---------------------------------------------------------------------------


def _tfidf_ref(docs, top_k=3):
    tf = {i: defaultdict(int) for i, _ in docs}
    for i, tx in docs:
        for t in _toks_ref(tx):
            tf[i][t] += 1
    dfreq = defaultdict(int)
    for i, _ in docs:
        for t in tf[i]:
            dfreq[t] += 1
    out = set()
    for i, _ in docs:
        ranked = sorted(
            tf[i].items(), key=lambda kv: (-kv[1], dfreq[kv[0]], kv[0])
        )
        for rk, (t, n) in enumerate(ranked[:top_k], 1):
            out.add((i, t, n, dfreq[t], rk))
    return out


@pytest.mark.parametrize("seed", [44])
def test_tfidf_top_terms_matches_bruteforce(spark, seed):
    """The engine computes doc×term counts by sorting + run-length
    encoding the token array map-side; the referee counts with a dict.
    Seeds repeated terms, ties on tf (broken by df then term), and a
    single-token doc."""
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(15)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
        for i in range(60)
    ]
    docs += [(1000, "solo"), (1001, "tie tie bar bar zzz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"], r["tf"], r["df"], r["rank"])
        for r in tfidf_top_terms(df, "text", "doc_id", top_k=3).collect()
    }
    assert got == _tfidf_ref(docs)


def _lm_score_ref(docs):
    """lm_doc_score law: add-one bigram LM trained on the corpus
    (c1 = prefix counts), then per doc mean p_milli over its bigrams;
    docs with < 2 tokens are absent."""
    c12, c1, vocab = defaultdict(int), defaultdict(int), set()
    toks = {i: _toks_ref(tx) for i, tx in docs}
    for t in toks.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    out = {}
    for i, t in toks.items():
        bgs = list(zip(t, t[1:]))
        if not bgs:
            continue
        ps = [((c12[(a, b)] + 1) * 1000) // (c1[a] + v) for a, b in bgs]
        out[i] = (len(bgs), sum(ps) // len(bgs))
    return out


@pytest.mark.parametrize("seed", [45])
def test_lm_doc_score_matches_bruteforce(spark, seed):
    from yandex_tracker_exporter_spark.operators.text_analysis import lm_doc_score

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(10)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 20))))
        for i in range(70)
    ]
    docs += [(900, "solo"), (901, ""), (902, "   ")]  # < 2 tokens: absent
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_p_milli"])
        for r in lm_doc_score(df).collect()
    }
    assert got == _lm_score_ref(docs)
    assert 900 not in got and 901 not in got and 902 not in got


@pytest.mark.parametrize("seed", [46])
def test_length_buckets_matches_bruteforce(spark, seed):
    """Bucket = bit length of the token count (0 tokens → bucket 0,
    ceiling 0); pad_waste = Σ (2^bucket − 1 − tokens)."""
    from yandex_tracker_exporter_spark.operators.text_analysis import length_buckets

    rng = random.Random(seed)
    docs = [
        (i, " ".join("x" for _ in range(rng.randrange(0, 200))))
        for i in range(150)
    ]
    docs += [(500, ""), (501, "a"), (502, " ".join(["b"] * 1023))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["bucket"]: (r["ceiling"], r["n_docs"], r["sum_tokens"], r["pad_waste"])
        for r in length_buckets(df).collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for _, tx in docs:
        n = len(_toks_ref(tx))  # '' → 1 empty token, like the engine
        b = n.bit_length() if n > 0 else 0
        cell = agg[b]
        cell[0] += 1
        cell[1] += n
        cell[2] += (1 << b) - 1 - n
    want = {b: ((1 << b) - 1, c[0], c[1], c[2]) for b, c in agg.items()}
    assert got == want


# ---------------------------------------------------------------------------
# HLL register merge (hll_union_pairs)
# ---------------------------------------------------------------------------

HLL_M = 64
HLL_RHO_MAX = 26
HLL_ALPHA_64 = 0.7213 / (1.0 + 1.079 / 64)
HLL_NUMERATOR = HLL_ALPHA_64 * (64 * 64) * float(1 << 26)


def _hll_regs(values):
    regs = {}
    for v in values:
        h = _mixed(str(v), ":hll")
        reg = h % HLL_M
        w = h >> 6
        rho = HLL_RHO_MAX if w == 0 else HLL_RHO_MAX - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _hll_est(regs):
    s = sum(1 << (HLL_RHO_MAX - m) for m in regs.values())
    s += (HLL_M - len(regs)) * (1 << HLL_RHO_MAX)
    return math.floor(HLL_NUMERATOR / float(s))


@pytest.mark.parametrize("seed", [47])
def test_hll_union_pairs_matches_bruteforce(spark, seed):
    """Mergeability law: max per register across two groups IS the
    union's sketch. The referee builds per-group register dicts and
    max-merges them — no joins, no register-table union."""
    from yandex_tracker_exporter_spark.operators.sketches import hll_union_pairs

    rng = random.Random(seed)
    rows = [(rng.choice(["a", "b", "c"]), rng.randrange(4000)) for _ in range(2500)]
    rows += [("d", 7)]  # single-value group merges too
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        (r["grp_a"], r["grp_b"]): r["est_union"]
        for r in hll_union_pairs(df, "v", "grp").collect()
    }
    by_grp = defaultdict(list)
    for g, v in rows:
        by_grp[g].append(v)
    regs = {g: _hll_regs(vs) for g, vs in by_grp.items()}
    want = {}
    for ga in regs:
        for gb in regs:
            if ga < gb:
                merged = dict(regs[ga])
                for r, m in regs[gb].items():
                    merged[r] = max(merged.get(r, 0), m)
                want[(ga, gb)] = _hll_est(merged)
    assert got == want


# ---------------------------------------------------------------------------
# sf0.001 real-parquet referees: inline contract queries recomputed in
# pure Python from the same files (via duckdb scan — no Spark, no SQL
# beyond SELECT *)
# ---------------------------------------------------------------------------


def _events_rows():
    return _fetch(
        f"SELECT event_id, ts, user_id, event_type, value, props "
        f"FROM '{SF_DIR}/events.parquet'"
    )


def test_bpe_first_merges_matches_bruteforce_sf(spark):
    """Adjacent-character-pair counts weighted by word frequency, words
    of length >= 2 only, top-20 by (weight desc, pair asc)."""
    rows = _fetch(f"SELECT text FROM '{SF_DIR}/documents.parquet'")
    freq = defaultdict(int)
    for (tx,) in rows:
        for w in _toks_ref(tx):
            if len(w) >= 2:
                freq[w] += 1
    weight = defaultdict(int)
    for w, f in freq.items():
        for i in range(len(w) - 1):
            weight[w[i : i + 2]] += f
    want = sorted(weight.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["pair"], r["weight"])
        for r in entry.queries()["bpe_first_merges"](spark, SF_DIR).collect()
    ]
    # engine emits top-20 unordered rows (orderBy+limit fixes the SET,
    # not the collected order)
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def _lev_ref(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_dp_sf(spark):
    """Every returned candidate pair's distance vs an independent
    two-row DP — cross-checks the builtin levenshtein the engine and
    DuckDB both rely on."""
    out = entry.queries()["edit_distance_pairs"](spark, SF_DIR).collect()
    assert out, "sf0.001 must produce candidate pairs"
    texts = dict(
        _fetch(f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'")
    )
    for r in out:
        assert r["edit_distance"] == _lev_ref(
            texts[r["a_id"]], texts[r["b_id"]]
        ), (r["a_id"], r["b_id"])


def test_robust_stats_matches_bruteforce_sf(spark):
    """Median/MAD law: exact type-7 interpolated percentiles over value
    cents, deviations against the double median."""
    by_seg = defaultdict(list)
    for _, _, _, ty, v, _ in _events_rows():
        by_seg[ty].append(math.floor(v * 100))
    want = {}
    for seg, cents in by_seg.items():
        med = _pct_type7(cents, 0.5)
        mad = _pct_type7([abs(float(c) - med) for c in cents], 0.5)
        want[seg] = (len(cents), med, mad)
    got = {
        r["segment"]: (r["n"], r["median_cents"], r["mad_cents"])
        for r in entry.queries()["robust_stats"](spark, SF_DIR).collect()
    }
    assert got == want


def test_contingency_chi2_matches_bruteforce_sf(spark):
    orders = _fetch(
        f"SELECT o_custkey, o_orderpriority FROM '{SF_DIR}/orders.parquet'"
    )
    seg = dict(
        _fetch(f"SELECT c_custkey, c_mktsegment FROM '{SF_DIR}/customer.parquet'")
    )
    cells = defaultdict(int)
    for ck, pr in orders:
        cells[(seg[ck], pr)] += 1
    rmarg, cmarg = defaultdict(int), defaultdict(int)
    for (s, p), n in cells.items():
        rmarg[s] += n
        cmarg[p] += n
    t = sum(cells.values())
    want = {
        (s, p): (
            n,
            (rmarg[s] * cmarg[p] * 1000) // t,
            ((n * t - rmarg[s] * cmarg[p]) ** 2) // (rmarg[s] * cmarg[p] * t),
        )
        for (s, p), n in cells.items()
    }
    got = {
        (r["segment"], r["priority"]): (
            r["observed"],
            r["expected_milli"],
            r["chi2_contrib"],
        )
        for r in entry.queries()["contingency_chi2"](spark, SF_DIR).collect()
    }
    assert got == want


def test_ab_test_matches_bruteforce_sf(spark):
    """Arms from the salted hash split, conversion = >26 purchase
    events, z in the engine's fixed operation order (bit-exact
    doubles)."""
    per_user = defaultdict(int)
    users = set()
    for _, _, uid, ty, _, _ in _events_rows():
        users.add(uid)
        if ty == "purchase":
            per_user[uid] += 1
    arms = defaultdict(lambda: [0, 0])
    for uid in users:
        arm = "A" if _mixed(str(uid), "exp1:") % 2 == 0 else "B"
        arms[arm][0] += 1
        arms[arm][1] += 1 if per_user[uid] > 26 else 0
    (na, ca), (nb, cb) = arms["A"], arms["B"]
    pa, pb = ca / na, cb / nb
    pp = (ca + cb) / (na + nb)
    denom = math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    z = (pa - pb) / denom if denom > 0.0 else 0.0
    r = entry.queries()["ab_test"](spark, SF_DIR).collect()[0]
    assert (
        r["na"], r["ca"], r["nb"], r["cb"],
        r["rate_a_milli"], r["rate_b_milli"],
    ) == (na, ca, nb, cb, (ca * 1000) // na, (cb * 1000) // nb)
    assert r["z_stat"] == z, "z must be BIT-identical, not close"


def _scd2_ref(rows):
    """Pure-Python SCD2: per entity, events ordered by (ts, event_id),
    consecutive equal values collapse; valid_to = next change's epoch,
    open run → sentinel."""
    import json as _json

    by_ent = defaultdict(list)
    for eid, ts, uid, _, _, props in rows:
        k = _json.loads(props).get("k") if props else None
        by_ent[uid].append((ts, eid, None if k is None else int(k)))
    out = []
    for ent, evs in by_ent.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        runs = []
        for ts, eid, val in evs:
            if not runs or runs[-1][1] != val:
                runs.append((_epoch(ts), val))
        for i, (ep, val) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else 9_999_999_999
            out.append((ent, val, ep, nxt, 1 if i + 1 == len(runs) else 0))
    return out


def test_state_dwell_time_matches_bruteforce_sf(spark):
    """Dwell = Σ (valid_to − valid_from) over CLOSED intervals per
    k-state; the open tail is excluded, not counted huge."""
    dwell = defaultdict(lambda: [0, 0])
    for _, val, vfrom, vto, _ in _scd2_ref(_events_rows()):
        if vto != 9_999_999_999:
            cell = dwell[val]
            cell[0] += 1
            cell[1] += vto - vfrom
    want = {k: tuple(v) for k, v in dwell.items()}
    got = {
        r["k_value"]: (r["n_intervals"], r["total_dwell_s"])
        for r in entry.queries()["state_dwell_time"](spark, SF_DIR).collect()
    }
    assert got == want


def test_pit_enrich_matches_bruteforce_sf(spark):
    """Each purchase joins the signup-stream SCD2 state valid at its
    timestamp; purchases before any signup land in the -1 bucket."""
    rows = _events_rows()
    signup_iv = _scd2_ref([r for r in rows if r[3] == "signup"])
    by_ent = defaultdict(list)
    for ent, val, vfrom, vto, _ in signup_iv:
        by_ent[ent].append((vfrom, vto, val))
    counts = defaultdict(int)
    for _, ts, uid, ty, _, _ in rows:
        if ty != "purchase":
            continue
        ep = _epoch(ts)
        hit = None
        for vfrom, vto, val in by_ent.get(uid, []):
            if vfrom <= ep < vto:
                hit = val
                break
        counts[-1 if hit is None else hit] += 1
    got = {
        r["k_value"]: r["n_purchases"]
        for r in entry.queries()["pit_enrich"](spark, SF_DIR).collect()
    }
    assert got == dict(counts)


def test_ohlc_hourly_matches_bruteforce_sf(spark):
    by_hour = defaultdict(list)
    for eid, ts, _, _, v, _ in _events_rows():
        hour = _epoch(ts.replace(minute=0, second=0, microsecond=0))
        by_hour[hour].append((ts, eid, v))
    want = {}
    for h, evs in by_hour.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        vals = [v for _, _, v in evs]
        want[h] = (evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))
    got = {
        r["hour_epoch"]: (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in entry.queries()["ohlc_hourly"](spark, SF_DIR).collect()
    }
    assert got == want


def test_conversion_latency_matches_bruteforce_sf(spark):
    """First view → first purchase AT OR AFTER it, per user; exact
    type-7 percentiles over the latencies."""
    first_view, purchases = {}, defaultdict(list)
    for _, ts, uid, ty, _, _ in _events_rows():
        ep = _epoch(ts)
        if ty == "view":
            first_view[uid] = min(first_view.get(uid, ep), ep)
        elif ty == "purchase":
            purchases[uid].append(ep)
    lats = []
    for uid, t0 in first_view.items():
        after = [p - t0 for p in purchases.get(uid, []) if p >= t0]
        if after:
            lats.append(min(after))
    r = entry.queries()["conversion_latency"](spark, SF_DIR).collect()[0]
    assert r["n_converted"] == len(lats)
    assert r["p50_s"] == _pct_type7(lats, 0.5)
    assert r["p90_s"] == _pct_type7(lats, 0.9)
    assert r["max_s"] == max(lats)


def test_weekly_churn_matches_bruteforce_sf(spark):
    """Churn in week W = active users with no activity in W+1; the last
    observed week is excluded (undefined, not zero)."""
    weeks = defaultdict(set)
    for _, ts, uid, _, _, _ in _events_rows():
        weeks[_epoch(ts) // 604800].add(uid)
    last = max(weeks)
    want = {}
    for w in sorted(weeks):
        if w >= last:
            continue
        active = weeks[w]
        churned = sum(
            1
            for u in active
            if not any(u in weeks.get(w2, ()) for w2 in range(w + 1, w + 2))
        )
        want[w] = (len(active), churned, (churned * 1000) // len(active))
    got = {
        r["week_idx"]: (r["n_active"], r["n_churned"], r["churn_milli"])
        for r in entry.queries()["weekly_churn"](spark, SF_DIR).collect()
    }
    assert got == want


def test_pareto_8020_matches_bruteforce_sf(spark):
    orders = _fetch(
        f"SELECT o_custkey, o_totalprice FROM '{SF_DIR}/orders.parquet'"
    )
    cust = dict(
        _fetch(f"SELECT c_custkey, c_nationkey FROM '{SF_DIR}/customer.parquet'")
    )
    nation = {
        nk: (nm, rk)
        for nk, nm, rk in _fetch(
            f"SELECT n_nationkey, n_name, n_regionkey FROM '{SF_DIR}/nation.parquet'"
        )
    }
    region = dict(
        _fetch(f"SELECT r_regionkey, r_name FROM '{SF_DIR}/region.parquet'")
    )
    rev = defaultdict(int)
    for ck, price in orders:
        nm, rk = nation[cust[ck]]
        rev[(region[rk], nm)] += math.floor(price * 100)
    by_region = defaultdict(list)
    for (rn, nn), cents in rev.items():
        by_region[rn].append((nn, cents))
    want = {}
    for rn, items in by_region.items():
        items.sort(key=lambda kv: (-kv[1], kv[0]))
        tot = sum(c for _, c in items)
        cum = 0
        for rank, (nn, cents) in enumerate(items, 1):
            prev_cum = cum
            cum += cents
            want[(rn, nn)] = (
                cents,
                rank,
                (cum * 1000) // tot,
                1 if prev_cum * 1000 < 800 * tot else 0,
            )
    got = {
        (r["r_name"], r["n_name"]): (
            r["revenue_cents"],
            r["rank_in_region"],
            r["cum_share_milli"],
            r["in_top80"],
        )
        for r in entry.queries()["pareto_8020"](spark, SF_DIR).collect()
    }
    assert got == want


def test_global_rank_matches_bruteforce_sf(spark):
    docs = _fetch(f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet'")
    ranked = sorted(docs, key=lambda r: (r[1], r[0]))
    want = {did: (nc, i) for i, (did, nc) in enumerate(ranked, 1)}
    got = {
        r["doc_id"]: (r["n_chars"], r["global_rank"])
        for r in entry.queries()["global_rank"](spark, SF_DIR).collect()
    }
    assert got == want


def test_copurchase_recs_matches_bruteforce_sf(spark):
    li = _fetch(f"SELECT l_orderkey, l_partkey FROM '{SF_DIR}/lineitem.parquet'")
    by_order = defaultdict(list)
    for ok, pk in li:
        by_order[ok].append(pk)
    together = defaultdict(int)
    for parts in by_order.values():
        for p1 in parts:
            for p2 in parts:
                if p1 != p2:
                    together[(p1, p2)] += 1
    by_part = defaultdict(list)
    for (p1, p2), n in together.items():
        by_part[p1].append((p2, n))
    want = set()
    for p1, recs in by_part.items():
        recs.sort(key=lambda kv: (-kv[1], kv[0]))
        for rk, (p2, n) in enumerate(recs[:3], 1):
            want.add((p1, p2, n, rk))
    got = {
        (r["part"], r["rec_part"], r["n_together"], r["rec_rank"])
        for r in entry.queries()["copurchase_recs"](spark, SF_DIR).collect()
    }
    assert got == want


def test_negative_sampling_matches_bruteforce_sf(spark):
    ids = [i for (i,) in _fetch(f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'")]
    n = len(ids)
    want = set()
    for i in ids:
        for rank in range(1, 5):
            cand = (i * 2654435761 + rank * 40503) % n
            want.add((i, rank, (cand + 1) % n if cand == i else cand))
    got = {
        (r["doc_id"], r["neg_rank"], r["neg_id"])
        for r in entry.queries()["negative_sampling"](spark, SF_DIR).collect()
    }
    assert got == want


def test_salted_bucket_families_are_independent():
    """The defect the mix step closes: the raw poly fold is affine
    across salts, so two salt families used to agree on nearly every
    key (shifted copies — useless for k-fold) and sequential keys got
    sequential buckets. Under the mixed law, cross-family agreement is
    ~1/buckets and sequential keys decorrelate."""
    from tests.test_differential_reference import _mixed, _poly

    n, buckets = 5000, 100
    a = [_mixed(str(i), "sample:") % buckets for i in range(n)]
    b = [_mixed(str(i), "fold2:") % buckets for i in range(n)]
    agree = sum(x == y for x, y in zip(a, b)) / n
    assert agree < 0.03, f"families correlated: agreement {agree}"
    # sequential keys: consecutive-bucket steps must not be constant
    steps = {(a[i + 1] - a[i]) % buckets for i in range(200)}
    assert len(steps) > 20, f"sequential keys map to a lattice: {steps}"
    # the OLD law really had the defect (guard against a vacuous test):
    # same-length keys differ by a constant across salts
    olds = [
        (_poly(f"s1:{i}") - _poly(f"s2:{i}")) % (2**31 - 1)
        for i in range(1000, 1200)
    ]
    assert len(set(olds)) == 1, "prefix-salt affinity assumption changed"
