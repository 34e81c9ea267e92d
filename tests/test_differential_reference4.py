"""Differential brute-force references, wave 4 (round 7): closes the
queries that until now had ONLY oracle parity (plus the blanket plan
guards) as correctness evidence — the plain-SQL/TPC-H family, the
map-only text scorers, and the kNN / k-means consumers. Every referee
here is a dict-and-loop / pure-Python reimplementation of the QUERY's
documented contract computed straight from the sf0.001 parquet
(fetched via DuckDB as a row transport only — no SQL aggregation, so
the referee is not oracle-shaped), compared against the live Spark
query output.

Conventions shared with waves 1-3: decimal sums replay Spark's
double→decimal(…,2) HALF_UP-over-shortest-repr cast; float reductions
replay the engine's left-fold operand order; integer `div` is
TRUNCATED division (Spark semantics), never Python floor.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from datetime import datetime, timezone
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _dec2(v: float) -> Decimal:
    """Spark's Cast(double → decimal(p,2)): BigDecimal of the SHORTEST
    decimal repr (Double.toString ≡ Python repr), then HALF_UP to 2dp."""
    return Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)


def _tdiv(a: int, b: int) -> int:
    """Spark SQL `div`: integral division TRUNCATING toward zero
    (Python's // floors, which differs on negative operands)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _rows(q: str, spark):
    return [tuple(r) for r in entry.queries()[q](spark, SF_DIR).collect()]


# ---------------------------------------------------------------------------
# TPC-H-ish SQL family
# ---------------------------------------------------------------------------


def _lineitem():
    return _fetch(
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        f" l_shipdate FROM '{SF_DIR}/lineitem.parquet'"
    )


def _orders():
    return _fetch(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        f" o_orderdate, o_orderpriority FROM '{SF_DIR}/orders.parquet'"
    )


def _customers():
    return _fetch(
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"
        f" FROM '{SF_DIR}/customer.parquet'"
    )


def _nations():
    return dict(
        _fetch(f"SELECT n_nationkey, n_name FROM '{SF_DIR}/nation.parquet'")
    )


def _docs():
    return _fetch(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{SF_DIR}/documents.parquet'"
    )


def test_pricing_summary_matches_bruteforce(spark):
    cutoff = datetime(1998, 9, 2)
    agg: dict = {}
    for (ok, pk, sk, ln, qty, price, disc, tax, rf, ls, sd) in _lineitem():
        if sd > cutoff:
            continue
        key = (rf, ls)
        a = agg.setdefault(
            key,
            [Decimal(0), Decimal(0), Decimal(0), Decimal(0), 0],
        )
        dq, dp = _dec2(qty), _dec2(price)
        dd, dt = _dec2(disc), _dec2(tax)
        disc_price = dp * (Decimal("1.00") - dd)
        a[0] += dq
        a[1] += dp
        a[2] += disc_price
        a[3] += disc_price * (Decimal("1.00") + dt)
        a[4] += 1
    want = {
        k: (
            float(v[0]),
            float(v[1]),
            float(v[2]),
            float(v[3]),
            float(v[0]) / v[4],
            float(v[1]) / v[4],
            v[4],
        )
        for k, v in agg.items()
    }
    got = {(r[0], r[1]): tuple(r[2:]) for r in _rows("pricing_summary", spark)}
    assert got == want


def test_region_revenue_matches_bruteforce(spark):
    cust_nation = {c[0]: c[2] for c in _customers()}
    nation_region = dict(
        _fetch(f"SELECT n_nationkey, n_regionkey FROM '{SF_DIR}/nation.parquet'")
    )
    region_name = dict(
        _fetch(f"SELECT r_regionkey, r_name FROM '{SF_DIR}/region.parquet'")
    )
    agg: dict = defaultdict(lambda: [Decimal(0), 0])
    for (ok, ck, st, tp, od, pr) in _orders():
        rname = region_name[nation_region[cust_nation[ck]]]
        agg[rname][0] += _dec2(tp)
        agg[rname][1] += 1
    want = {k: (float(v[0]), v[1]) for k, v in agg.items()}
    got = {r[0]: (r[1], r[2]) for r in _rows("region_revenue", spark)}
    assert got == want


def test_top_customers_matches_bruteforce(spark):
    rev: dict = defaultdict(Decimal)
    for (ok, ck, st, tp, od, pr) in _orders():
        rev[ck] += _dec2(tp)
    names = {c[0]: c[1] for c in _customers()}
    ranked = sorted(
        ((ck, names[ck], float(d)) for ck, d in rev.items()),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert _rows("top_customers", spark) == ranked


def test_point_lookup_matches_bruteforce(spark):
    want = sorted(
        (ok, ck, st, tp)
        for (ok, ck, st, tp, od, pr) in _orders()
        if ok == 42
    )
    assert sorted(_rows("point_lookup", spark)) == want


def test_anti_join_matches_bruteforce(spark):
    with_orders = {o[1] for o in _orders()}
    want = sorted(
        (ck, nm, nk)
        for (ck, nm, nk, ab, seg) in _customers()
        if ck not in with_orders
    )
    assert sorted(_rows("anti_join", spark)) == want


def test_set_ops_matches_bruteforce(spark):
    h1, h2 = set(), set()
    for (ok, ck, st, tp, od, pr) in _orders():
        if datetime(1995, 1, 1) <= od < datetime(1995, 7, 1):
            h1.add(ck)
        elif datetime(1995, 7, 1) <= od < datetime(1996, 1, 1):
            h2.add(ck)
    want = sorted((ck,) for ck in h1 & h2)
    assert sorted(_rows("set_ops", spark)) == want


def test_distinct_agg_matches_bruteforce(spark):
    cust_nation = {c[0]: c[2] for c in _customers()}
    nations = _nations()
    per_nation: dict = defaultdict(lambda: [set(), 0])
    for (ok, ck, st, tp, od, pr) in _orders():
        a = per_nation[nations[cust_nation[ck]]]
        a[0].add(ck)
        a[1] += 1
    want = {k: (len(v[0]), v[1]) for k, v in per_nation.items()}
    got = {r[0]: (r[1], r[2]) for r in _rows("distinct_agg", spark)}
    assert got == want


def test_sql_interface_matches_bruteforce(spark):
    cust_nation = {c[0]: c[2] for c in _customers()}
    nations = _nations()
    agg: dict = defaultdict(lambda: [0, Decimal(0)])
    for (ok, ck, st, tp, od, pr) in _orders():
        a = agg[nations[cust_nation[ck]]]
        a[0] += 1
        a[1] += _dec2(tp)
    want = {k: (v[0], float(v[1])) for k, v in agg.items() if v[0] >= 10}
    got = {r[0]: (r[1], r[2]) for r in _rows("sql_interface", spark)}
    assert got == want


def test_supplier_balance_matches_bruteforce(spark):
    nations = _nations()
    agg: dict = defaultdict(lambda: [Decimal(0), 0])
    for (sk, nk, ab) in _fetch(
        f"SELECT s_suppkey, s_nationkey, s_acctbal FROM '{SF_DIR}/supplier.parquet'"
    ):
        a = agg[nations[nk]]
        a[0] += _dec2(ab)
        a[1] += 1
    want = {k: (float(v[0]), v[1]) for k, v in agg.items()}
    got = {r[0]: (r[1], r[2]) for r in _rows("supplier_balance", spark)}
    assert got == want


def _orders_groupfold():
    """(status, priority) → [count, Decimal revenue] over all orders."""
    agg: dict = defaultdict(lambda: [0, Decimal(0)])
    for (ok, ck, st, tp, od, pr) in _orders():
        a = agg[(st, pr)]
        a[0] += 1
        a[1] += _dec2(tp)
    return agg


def test_rollup_orders_matches_bruteforce(spark):
    detail = _orders_groupfold()
    want: dict = {}
    for (st, pr), (n, d) in detail.items():
        want[(st, pr)] = [n, d]
    sub: dict = defaultdict(lambda: [0, Decimal(0)])
    tot = [0, Decimal(0)]
    for (st, pr), (n, d) in detail.items():
        sub[st][0] += n
        sub[st][1] += d
        tot[0] += n
        tot[1] += d
    for st, v in sub.items():
        want[(st, None)] = v
    want[(None, None)] = tot
    wantf = {k: (v[0], float(v[1])) for k, v in want.items()}
    got = {(r[0], r[1]): (r[2], r[3]) for r in _rows("rollup_orders", spark)}
    assert got == wantf


def test_cube_orders_matches_bruteforce(spark):
    detail = _orders_groupfold()
    want: dict = defaultdict(lambda: [0, Decimal(0)])
    for (st, pr), (n, d) in detail.items():
        for key in ((st, pr), (st, None), (None, pr), (None, None)):
            want[key][0] += n
            want[key][1] += d
    wantf = {k: (v[0], float(v[1])) for k, v in want.items()}
    got = {(r[0], r[1]): (r[2], r[3]) for r in _rows("cube_orders", spark)}
    assert got == wantf


def test_grouping_sets_matches_bruteforce(spark):
    detail = _orders_groupfold()
    want: dict = defaultdict(lambda: [0, Decimal(0)])
    for (st, pr), (n, d) in detail.items():
        # gid bit per column in declared order, 1 = aggregated away
        for key in ((st, pr, 0), (st, None, 1), (None, None, 3)):
            want[key][0] += n
            want[key][1] += d
    wantf = {k: (v[0], float(v[1])) for k, v in want.items()}
    got = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in _rows("grouping_sets_orders", spark)
    }
    assert got == wantf


def test_pivot_orders_matches_bruteforce(spark):
    counts: dict = defaultdict(Counter)
    for (ok, ck, st, tp, od, pr) in _orders():
        counts[pr][st] += 1
    want = {
        pr: (c.get("F", 0), c.get("O", 0), c.get("P", 0))
        for pr, c in counts.items()
    }
    got = {r[0]: (r[1], r[2], r[3]) for r in _rows("pivot_orders", spark)}
    assert got == want


def test_running_total_matches_bruteforce(spark):
    per_cust: dict = defaultdict(list)
    for (ok, ck, st, tp, od, pr) in _orders():
        if ck < 50:
            per_cust[ck].append((od, ok, _dec2(tp)))
    want = []
    for ck, rows in per_cust.items():
        acc = Decimal(0)
        for od, ok, d in sorted(rows, key=lambda t: (t[0], t[1])):
            acc += d
            want.append((ck, ok, float(acc)))
    assert sorted(_rows("running_total", spark)) == sorted(want)


def test_shipping_priority_matches_bruteforce(spark):
    cutoff = datetime(1998, 6, 1)
    building = {
        c[0] for c in _customers() if c[4] == "BUILDING"
    }
    orders = {
        o[0]: (o[1], o[4], o[5])
        for o in _orders()
        if o[4] < cutoff
    }
    agg: dict = defaultdict(Decimal)
    for (ok, pk, sk, ln, qty, price, disc, tax, rf, ls, sd) in _lineitem():
        if sd <= cutoff or ok not in orders:
            continue
        ck, od, pr = orders[ok]
        if ck not in building:
            continue
        agg[(ok, od, pr)] += _dec2(price) * (Decimal("1.00") - _dec2(disc))
    ranked = sorted(
        (
            (ok, math.floor(od.replace(tzinfo=timezone.utc).timestamp()), pr,
             float(d))
            for (ok, od, pr), d in agg.items()
        ),
        key=lambda t: (-t[3], t[0]),
    )[:10]
    assert _rows("shipping_priority", spark) == ranked


def test_cheapest_supplier_matches_bruteforce(spark):
    best: dict = {}
    for (ok, pk, sk, ln, qty, price, disc, tax, rf, ls, sd) in _lineitem():
        cents = math.floor(price * 100)
        key = (cents, sk, ok, ln)
        if pk not in best or key < best[pk]:
            best[pk] = key
    brand = dict(
        _fetch(f"SELECT p_partkey, p_brand FROM '{SF_DIR}/part.parquet'")
    )
    want = {
        pk: (brand[pk], k[1], k[0]) for pk, k in best.items() if pk in brand
    }
    got = {r[0]: (r[1], r[2], r[3]) for r in _rows("cheapest_supplier", spark)}
    assert got == want


def test_trade_volume_q7_matches_bruteforce(spark):
    nations = _nations()
    cust_nation = {c[0]: c[2] for c in _customers()}
    supp_nation = dict(
        _fetch(f"SELECT s_suppkey, s_nationkey FROM '{SF_DIR}/supplier.parquet'")
    )
    order_cust = {o[0]: o[1] for o in _orders()}
    agg: dict = defaultdict(int)
    for (ok, pk, sk, ln, qty, price, disc, tax, rf, ls, sd) in _lineitem():
        if not (datetime(1995, 1, 1) <= sd <= datetime(1996, 12, 31)):
            continue
        cn = nations[cust_nation[order_cust[ok]]]
        sn = nations[supp_nation[sk]]
        agg[(sn, cn, sd.year)] += math.floor(price * (1.0 - disc) * 100)
    got = {(r[0], r[1], r[2]): r[3] for r in _rows("trade_volume_q7", spark)}
    assert got == dict(agg)


def test_mom_revenue_matches_bruteforce(spark):
    nations = _nations()
    cust_nation = {c[0]: c[2] for c in _customers()}
    monthly: dict = defaultdict(int)
    for (ok, ck, st, tp, od, pr) in _orders():
        mep = math.floor(
            datetime(od.year, od.month, 1, tzinfo=timezone.utc).timestamp()
        )
        monthly[(nations[cust_nation[ck]], mep)] += math.floor(tp * 100)
    per_nation: dict = defaultdict(list)
    for (nn, mep), cents in monthly.items():
        per_nation[nn].append((mep, cents))
    want = []
    for nn, rows in per_nation.items():
        rows.sort()
        for (pm, pc), (m, c) in zip(rows, rows[1:]):
            want.append((nn, m, c, _tdiv((c - pc) * 1000, pc)))
    assert sorted(_rows("mom_revenue", spark)) == sorted(want)


def test_moving_avg_daily_matches_bruteforce(spark):
    daily: dict = defaultdict(lambda: [Decimal(0), 0])
    epoch0 = datetime(1970, 1, 1)
    for (ok, ck, st, tp, od, pr) in _orders():
        day = (datetime(od.year, od.month, od.day) - epoch0).days
        daily[day][0] += _dec2(tp)
        daily[day][1] += 1
    days = sorted(daily)
    want = []
    for i, d in enumerate(days):
        win = days[max(0, i - 6): i + 1]
        wsum = sum((daily[x][0] for x in win), Decimal(0))
        want.append(
            (d, float(daily[d][0]), daily[d][1], float(wsum) / len(win))
        )
    assert sorted(_rows("moving_avg_daily", spark)) == sorted(want)


def test_percent_rank_matches_bruteforce(spark):
    per_seg: dict = defaultdict(list)
    for (ck, nm, nk, ab, seg) in _customers():
        per_seg[seg].append((ab, ck))
    want = {}
    for seg, rows in per_seg.items():
        vals = sorted(ab for ab, _ in rows)
        n = len(vals)
        # rank = 1 + count(strictly smaller); cume = count(<=)
        from bisect import bisect_left, bisect_right

        for ab, ck in rows:
            rank = bisect_left(vals, ab) + 1
            cume = bisect_right(vals, ab)
            pct = 0.0 if n == 1 else (rank - 1) / (n - 1)
            want[ck] = (seg, pct, cume / n)
    got = {r[0]: (r[1], r[2], r[3]) for r in _rows("percent_rank_acctbal", spark)}
    assert got == want


def test_ntile_quartiles_matches_bruteforce(spark):
    per_type: dict = defaultdict(list)
    for (eid, ts, uid, ty, v, props) in _fetch(
        f"SELECT event_id, ts, user_id, event_type, value, props FROM '{SF_DIR}/events.parquet'"
    ):
        per_type[ty].append((v, eid))
    want: dict = {}
    for ty, rows in per_type.items():
        rows.sort()
        n = len(rows)
        base, rem = divmod(n, 4)
        idx = 0
        for b in range(4):
            size = base + (1 if b < rem else 0)
            chunk = rows[idx: idx + size]
            idx += size
            if not chunk:
                continue
            vals = [v for v, _ in chunk]
            want[(ty, b + 1)] = (len(chunk), min(vals), max(vals))
    got = {
        (r[0], r[1]): (r[2], r[3], r[4]) for r in _rows("ntile_quartiles", spark)
    }
    assert got == want


def test_value_percentiles_matches_bruteforce(spark):
    per_type: dict = defaultdict(list)
    for (eid, ts, uid, ty, v, props) in _fetch(
        f"SELECT event_id, ts, user_id, event_type, value, props FROM '{SF_DIR}/events.parquet'"
    ):
        per_type[ty].append(v)
    from test_differential_reference2 import _pct_type7

    want = {
        ty: (_pct_type7(vs, 0.5), _pct_type7(vs, 0.9), _pct_type7(vs, 0.99))
        for ty, vs in per_type.items()
    }
    got = {r[0]: (r[1], r[2], r[3]) for r in _rows("value_percentiles", spark)}
    assert got == want


def test_skew_report_matches_bruteforce(spark):
    counts = Counter(row[1] for row in _lineitem())
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:10]
    want = [(pk, n, _tdiv(n * 1000, total)) for pk, n in top]
    assert sorted(_rows("skew_report", spark)) == sorted(want)


def test_heatmap_hour_value_matches_bruteforce(spark):
    agg = Counter()
    for (eid, ts, uid, ty, v, props) in _fetch(
        f"SELECT event_id, ts, user_id, event_type, value, props FROM '{SF_DIR}/events.parquet'"
    ):
        band = min(max(math.floor(v / 10.0), 0), 9)
        agg[(ts.hour, band)] += 1
    got = {(r[0], r[1]): r[2] for r in _rows("heatmap_hour_value", spark)}
    assert got == dict(agg)


def test_weekday_seasonality_matches_bruteforce(spark):
    per: dict = defaultdict(lambda: [0, 0])  # (type, dow) -> [sum_cents, n]
    tot: dict = defaultdict(lambda: [0, 0])
    for (eid, ts, uid, ty, v, props) in _fetch(
        f"SELECT event_id, ts, user_id, event_type, value, props FROM '{SF_DIR}/events.parquet'"
    ):
        cents = math.floor(v * 100)
        dow = ts.weekday() + 1  # ISO Monday=1
        per[(ty, dow)][0] += cents
        per[(ty, dow)][1] += 1
        tot[ty][0] += cents
        tot[ty][1] += 1
    want = {
        (ty, dow): (n, _tdiv(s * tot[ty][1] * 1000, n * tot[ty][0]))
        for (ty, dow), (s, n) in per.items()
    }
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _rows("weekday_seasonality", spark)
    }
    assert got == want


# ---------------------------------------------------------------------------
# map-only text scorers over documents
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "of", "is", "not"),
    "es": ("el", "la", "de", "es", "que"),
    "fr": ("le", "la", "et", "est", "que"),
    "zh": ("的", "是", "不", "了", "在"),
}
QUALITY_STOPWORDS = ("the", "a", "and", "of", "to", "is", "in")


def _toks(text: str) -> list[str]:
    return text.strip().split()


def test_language_id_matches_bruteforce(spark):
    want = {}
    for (did, text, lang, source, nch) in _docs():
        toks = _toks(text)
        hits = {
            lg: sum(1 for t in toks if t in mk)
            for lg, mk in sorted(LANG_MARKERS.items())
        }
        mx = max(hits.values())
        best = next(lg for lg in sorted(hits) if hits[lg] == mx)
        want[did] = (best if mx > 0 else "und", mx)
    got = {r[0]: (r[1], r[2]) for r in _rows("language_id", spark)}
    assert got == want


def test_quality_score_matches_bruteforce(spark):
    want = {}
    for (did, text, lang, source, nch) in _docs():
        toks = _toks(text)
        nt, ncs = len(toks), len(text)
        atl = (ncs - (nt - 1)) / nt
        sr = sum(1 for t in toks if t in QUALITY_STOPWORDS) / nt
        q = min(1.0, nt / 64.0) * 0.5 + sr * 0.25 + min(1.0, atl / 8.0) * 0.25
        want[did] = (ncs, nt, atl, sr, q)
    got = {r[0]: tuple(r[1:]) for r in _rows("quality_score", spark)}
    assert got == want


def test_token_count_matches_bruteforce(spark):
    pat = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    want = {
        did: (len(_toks(text)), len(pat.findall(text)))
        for (did, text, lang, source, nch) in _docs()
    }
    got = {r[0]: (r[1], r[2]) for r in _rows("token_count", spark)}
    assert got == want


def test_doc_fingerprint_matches_bruteforce(spark):
    want = {}
    for (did, text, lang, source, nch) in _docs():
        acc = 0
        for ch in text:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        want[did] = acc
    got = {r[0]: r[1] for r in _rows("doc_fingerprint", spark)}
    assert got == want


def test_exact_dedup_matches_bruteforce(spark):
    groups: dict = defaultdict(list)
    for (did, text, lang, source, nch) in _docs():
        groups[hashlib.md5(text.encode("utf-8")).hexdigest()].append(did)
    want = {h: (min(ids), len(ids)) for h, ids in groups.items()}
    got = {r[0]: (r[1], r[2]) for r in _rows("exact_dedup", spark)}
    assert got == want


def test_corpus_clean_matches_bruteforce(spark):
    gated = []
    for (did, text, lang, source, nch) in _docs():
        toks = _toks(text)
        nt, ncs = len(toks), len(text)
        atl = (ncs - (nt - 1)) / nt
        sr = sum(1 for t in toks if t in QUALITY_STOPWORDS) / nt
        if nt >= 16 and sr <= 0.5:
            q = (
                min(1.0, nt / 64.0) * 0.5
                + sr * 0.25
                + min(1.0, atl / 8.0) * 0.25
            )
            gated.append((did, text, lang, nt, q))
    best: dict = {}
    for did, text, lang, nt, q in gated:
        h = hashlib.md5(text.encode("utf-8")).hexdigest()
        if h not in best or did < best[h][0]:
            best[h] = (did, lang, nt, q)
    want = sorted(best.values())
    assert sorted(_rows("corpus_clean", spark)) == want


def test_top_docs_per_lang_matches_bruteforce(spark):
    per_lang: dict = defaultdict(list)
    for (did, text, lang, source, nch) in _docs():
        per_lang[lang].append((nch, did))
    want = []
    for lang, rows in per_lang.items():
        ranked = sorted(rows, key=lambda t: (-t[0], t[1]))[:3]
        want.extend(
            (lang, did, nch, i + 1) for i, (nch, did) in enumerate(ranked)
        )
    assert sorted(_rows("top_docs_per_lang", spark)) == sorted(want)


def test_bigram_counts_matches_bruteforce(spark):
    counts = Counter()
    for (did, text, lang, source, nch) in _docs():
        toks = text.strip().split()
        if len(toks) >= 2:
            counts.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    ranked = sorted(
        ((bg, n) for bg, n in counts.items() if n >= 5),
        key=lambda t: (-t[1], t[0]),
    )[:50]
    assert _rows("bigram_counts", spark) == ranked


def test_vocab_oov_matches_bruteforce(spark):
    words: dict = defaultdict(list)
    cnt = Counter()
    for (did, text, lang, source, nch) in _docs():
        toks = text.strip().split()
        words[did] = toks
        cnt.update(toks)
    vocab = {
        w
        for w, _ in sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:20]
    }
    want = {
        did: (len(toks), sum(1 for t in toks if t not in vocab))
        for did, toks in words.items()
    }
    got = {r[0]: (r[1], r[2]) for r in _rows("vocab_oov_stats", spark)}
    assert got == want


def test_top_sources_agg_matches_bruteforce(spark):
    counts = Counter()
    for (did, text, lang, source, nch) in _docs():
        counts[(lang, source)] += 1
    per_lang: dict = defaultdict(list)
    for (lang, source), n in counts.items():
        per_lang[lang].append((n, source))
    want = {}
    for lang, rows in per_lang.items():
        ranked = sorted(rows, key=lambda t: (-t[0], t[1]))[:5]
        want[lang] = (
            ",".join(s for _, s in ranked),
            sum(n for n, _ in ranked),
            len(ranked),
        )
    got = {r[0]: (r[1], r[2], r[3]) for r in _rows("top_sources_agg", spark)}
    assert got == want


def test_dataset_card_matches_bruteforce(spark):
    docs = _docs()
    toks = [len(t.strip().split()) for (_, t, _, _, _) in docs]
    md5s = {hashlib.md5(t.encode("utf-8")).hexdigest() for (_, t, _, _, _) in docs}
    want = {
        "n_docs": len(docs),
        "n_tokens": sum(toks),
        "n_chars": sum(len(t) for (_, t, _, _, _) in docs),
        "n_langs": len({lg for (_, _, lg, _, _) in docs}),
        "n_sources": len({s for (_, _, _, s, _) in docs}),
        "n_exact_dups": len(docs) - len(md5s),
        "min_tokens": min(toks),
        "max_tokens": max(toks),
    }
    got = {r[0]: r[1] for r in _rows("dataset_card", spark)}
    assert got == want


def test_dedup_pipeline_report_stage_laws(spark):
    """Stages 1-2 recomputed exactly; stages 3-4 (LSH cluster members /
    clusters — their label law is pinned by the union-find referees in
    test_dedup_clusters) checked against the partition laws that hold
    for ANY clustering: 0 <= clusters <= members <= raw, and a cluster
    is only counted when it has members."""
    docs = _docs()
    md5s = {hashlib.md5(t.encode("utf-8")).hexdigest() for (_, t, _, _, _) in docs}
    got = {r[0]: r[1] for r in _rows("dedup_pipeline_report", spark)}
    assert got["1_raw"] == len(docs)
    assert got["2_exact_unique"] == len(md5s)
    members = got.get("3_cluster_members", 0)
    clusters = got.get("4_clusters", 0)
    assert 0 <= clusters <= members <= got["1_raw"]
    assert (members == 0) == (clusters == 0)


# ---------------------------------------------------------------------------
# session cross-proof
# ---------------------------------------------------------------------------


def test_session_windows_cross_proof_and_bruteforce(spark):
    """q_session_window_native (Spark native session_window) and
    q_session_gaps (gaps-and-islands) are two independent constructions
    of the same 30-minute-gap sessionization — their outputs must be
    row-identical, and both must match a pure-Python gap counter."""
    native = sorted(_rows("session_window_native", spark))
    gaps = sorted(_rows("session_gaps", spark))
    assert native == gaps

    per_user: dict = defaultdict(list)
    for (eid, ts, uid, ty, v, props) in _fetch(
        f"SELECT event_id, ts, user_id, event_type, value, props FROM '{SF_DIR}/events.parquet'"
    ):
        per_user[uid].append((ts, eid))
    want = []
    for uid, rows in per_user.items():
        rows.sort()
        sessions = 1
        for (p, _), (c, _) in zip(rows, rows[1:]):
            if (c - p).total_seconds() > 1800:
                sessions += 1
        want.append((uid, sessions, len(rows)))
    assert gaps == sorted(want)


# ---------------------------------------------------------------------------
# kNN and k-means consumers
# ---------------------------------------------------------------------------


def _embeddings():
    return _fetch(
        f"SELECT vec_id, embedding, label FROM '{SF_DIR}/embeddings.parquet'"
    )


def _cosine(a, b) -> float:
    """Replays the engine's LEFT-FOLD operand order exactly."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _knn_votes(n_queries: int):
    emb = _embeddings()
    queries = [(vid, v, lb) for (vid, v, lb) in emb if vid < n_queries]
    out = {}
    for qid, qv, qlb in queries:
        scored = sorted(
            (
                (-_cosine(qv, cv), nid, nlb)
                for (nid, cv, nlb) in emb
                if nid != qid
            ),
        )[:10]
        votes = Counter(nlb for _, _, nlb in scored)
        best = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0]
        out[qid] = (qlb, best[0], best[1])
    return out


def test_knn_classify_matches_bruteforce(spark):
    ref = _knn_votes(20)
    want = {qid: (pred, votes) for qid, (_, pred, votes) in ref.items()}
    got = {r[0]: (r[1], r[2]) for r in _rows("knn_classify", spark)}
    assert got == want


def test_knn_confusion_matches_bruteforce(spark):
    ref = _knn_votes(100)
    conf = Counter((t, p) for (t, p, _) in ref.values())
    got = {(r[0], r[1]): r[2] for r in _rows("knn_confusion", spark)}
    assert got == dict(conf)


def _lloyd_ref(k: int, iters: int):
    """Pure-Python Lloyd over int8-quantized embeddings: the documented
    kmeans_quantized contract (seed = first k ids, argmin int L2² with
    first-minimum ties, floor-div centroid update, empty cluster keeps
    its previous centroid)."""
    emb = sorted(_embeddings())
    codes = {}
    for vid, v, lb in emb:
        if v is None:
            continue
        m = max(abs(float(x)) for x in v)
        scale = 127.0 / m if m > 0.0 else 0.0
        codes[vid] = [int(math.floor(float(x) * scale + 0.5)) for x in v]
    ids = sorted(codes)
    cents = {i: list(codes[ids[i]]) for i in range(k)}

    def assign():
        out = {}
        for vid in ids:
            q = codes[vid]
            best_c, best_d = 0, None
            for c in range(k):
                d = sum((a - b) * (a - b) for a, b in zip(q, cents[c]))
                if best_d is None or d < best_d:
                    best_c, best_d = c, d
            out[vid] = (best_c, best_d)
        return out

    for _ in range(iters - 1):
        asg = assign()
        sums: dict = defaultdict(lambda: None)
        for vid, (c, _) in asg.items():
            if sums[c] is None:
                sums[c] = [0] * len(codes[vid]) + [0]
            for j, x in enumerate(codes[vid]):
                sums[c][j] += x
            sums[c][-1] += 1
        for c, s in sums.items():
            if s is not None:
                n = s[-1]
                cents[c] = [x // n for x in s[:-1]]
    return assign()


def test_kmeans_clusters_matches_bruteforce(spark):
    ref = _lloyd_ref(k=8, iters=3)
    got = {r[0]: (r[1], r[2]) for r in _rows("kmeans_clusters", spark)}
    assert got == ref


def test_cluster_balance_matches_bruteforce(spark):
    ref = _lloyd_ref(k=8, iters=2)
    sizes = Counter(c for c, _ in ref.values())
    total = sum(sizes.values())
    mx, kk = max(sizes.values()), len(sizes)
    want = {
        c: (n, _tdiv(n * 1000, total), _tdiv(mx * kk * 1000, total))
        for c, n in sizes.items()
    }
    got = {r[0]: (r[1], r[2], r[3]) for r in _rows("cluster_balance", spark)}
    assert got == want
