"""Unit tests for the round-4 stream-analytics batch: count-min sketch,
event transitions, OHLC bars, Pareto frontier, z-score outliers, and
largest-remainder mixture apportionment. Contract-level correctness is
covered by test_oracle_parity; these pin the operators' structural
invariants on crafted inputs where the expected answer is computable by
hand (or by brute force)."""

import datetime as dt
import itertools

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.funnel import event_transitions
from yandex_tracker_exporter_spark.operators.grouped import (
    ohlc_hourly,
    zscore_outliers,
)
from yandex_tracker_exporter_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
)
from yandex_tracker_exporter_spark.operators.text_analysis import (
    mixture_apportion,
    pareto_frontier,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts(spark):
    """est ≥ true for every key is the CMS structural guarantee —
    collisions only ever ADD to a counter."""
    words = ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 7 + ["delta"] * 1
    terms = spark.createDataFrame([(w,) for w in words], ["term"])
    counters = cms_counters(terms.groupBy("term").count(), count_col="count")
    keys = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",)], ["term"]
    )
    est = {r["term"]: r["est_cnt"] for r in cms_estimate(keys, counters).collect()}
    true = {"alpha": 50, "beta": 20, "gamma": 7, "delta": 1}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, k


def test_cms_exact_when_no_collisions(spark):
    """With 4 distinct terms in a 4×512 table the chance of a shared
    bucket in ALL rows is nil for this fixed hash family — estimates are
    exact, pinning that the counter/probe bucketing agree."""
    words = ["w%d" % i for i in range(4) for _ in range(i + 1)]
    terms = spark.createDataFrame([(w,) for w in words], ["term"])
    counters = cms_counters(terms.groupBy("term").count(), count_col="count")
    keys = terms.select("term").distinct()
    est = {r["term"]: r["est_cnt"] for r in cms_estimate(keys, counters).collect()}
    assert est == {"w0": 1, "w1": 2, "w2": 3, "w3": 4}


def test_cms_estimate_unseen_key_reports_zero(spark):
    """ADVICE r4 regression: a probed key that was never inserted hits
    buckets with NO counter row — those must read as 0 (min over depth
    counters sees the zero), and the key must appear in the output with
    est 0 instead of silently vanishing (the old inner join dropped
    it, or worse, over-estimated from the populated buckets only)."""
    words = ["alpha"] * 5 + ["beta"] * 3
    terms = spark.createDataFrame([(w,) for w in words], ["term"])
    counters = cms_counters(terms.groupBy("term").count(), count_col="count")
    keys = spark.createDataFrame([("alpha",), ("never-seen",)], ["term"])
    est = {r["term"]: r["est_cnt"] for r in cms_estimate(keys, counters).collect()}
    assert set(est) == {"alpha", "never-seen"}
    assert est["alpha"] >= 5
    # in a 4x512 table 2 distinct inserted terms cannot cover all 4 of
    # an unseen key's buckets, so at least one counter is 0 -> min is 0
    assert est["never-seen"] == 0


def test_cms_counter_table_is_bounded(spark):
    """The sketch state never exceeds depth × width rows regardless of
    vocabulary size — the fixed-state scaling argument."""
    terms = spark.createDataFrame(
        [("t%d" % i,) for i in range(5000)], ["term"]
    )
    counts = terms.groupBy("term").count()
    assert cms_counters(counts, count_col="count", depth=4, width=64).count() <= 4 * 64


# ---------------------------------------------------------------------------
# event transitions
# ---------------------------------------------------------------------------


def test_event_transitions_chain(spark):
    """A single user's a→b→a→c stream yields exactly the consecutive
    pairs with their gap seconds; n_trans totals n_events − n_users."""
    rows = [
        (1, 10, "a", _ts(0, 0, 0)),
        (1, 11, "b", _ts(0, 0, 10)),
        (1, 12, "a", _ts(0, 0, 25)),
        (1, 13, "c", _ts(0, 1, 25)),
        (2, 20, "b", _ts(1, 0, 0)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    out = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["sum_gap_s"])
        for r in event_transitions(ev).collect()
    }
    assert out == {("a", "b"): (1, 10), ("b", "a"): (1, 15), ("a", "c"): (1, 60)}


def test_event_transitions_ties_break_on_event_id(spark):
    """Two events at the same timestamp order by event_id — the same
    total order the oracle declares."""
    rows = [
        (1, 2, "b", _ts(0)),
        (1, 1, "a", _ts(0)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    out = event_transitions(ev).collect()
    assert len(out) == 1
    assert (out[0]["from_type"], out[0]["to_type"]) == ("a", "b")


# ---------------------------------------------------------------------------
# OHLC
# ---------------------------------------------------------------------------


def test_ohlc_bar_semantics(spark):
    rows = [
        (1, _ts(9, 0), 10.0),
        (2, _ts(9, 15), 30.0),
        (3, _ts(9, 45), 5.0),
        (4, _ts(9, 59), 20.0),
        (5, _ts(10, 1), 7.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    bars = {r["hour_epoch"]: r for r in ohlc_hourly(ev).collect()}
    nine = bars[int(_ts(9).replace(tzinfo=dt.timezone.utc).timestamp())]
    assert (nine["open"], nine["high"], nine["low"], nine["close"]) == (
        10.0,
        30.0,
        5.0,
        20.0,
    )
    assert nine["n_events"] == 4
    ten = bars[int(_ts(10).replace(tzinfo=dt.timezone.utc).timestamp())]
    assert ten["open"] == ten["close"] == 7.0


# ---------------------------------------------------------------------------
# Pareto frontier
# ---------------------------------------------------------------------------


def test_pareto_matches_bruteforce(spark):
    """The one-sort window formulation must equal the O(n²) NOT-EXISTS
    dominance definition on a crafted group with ties on both axes."""
    docs = [
        # (doc_id, lang, text) — gain = token count, cost = n_chars
        (1, "en", "a b c"),          # cost 5, gain 3
        (2, "en", "a b c d"),        # cost 7, gain 4
        (3, "en", "a b"),            # cost 3, gain 2
        (4, "en", "x y z"),          # cost 5, gain 3 (duplicate point)
        (5, "en", "aaaa bbbb"),      # cost 9, gain 2 (dominated)
        (6, "de", "aaaa bbbb"),      # other group: not compared
    ]
    df = spark.createDataFrame(
        [(i, lang, t, len(t)) for i, lang, t in docs],
        ["doc_id", "lang", "text", "n_chars"],
    )
    got = {
        (r["lang"], r["doc_id"]) for r in pareto_frontier(df).collect()
    }
    pts = {i: (lang, len(t), len(t.split())) for i, lang, t in docs}
    expected = set()
    for i, (lang, c, g) in pts.items():
        dominated = any(
            ol == lang and oc <= c and og >= g and (oc < c or og > g)
            for j, (ol, oc, og) in pts.items()
            if j != i
        )
        if not dominated:
            expected.add((lang, i))
    assert got == expected
    # equal (cost, gain) duplicates survive together
    assert ("en", 1) in got and ("en", 4) in got
    assert ("en", 5) not in got


# ---------------------------------------------------------------------------
# z-score outliers
# ---------------------------------------------------------------------------


def test_zscore_flags_only_the_planted_outlier(spark):
    vals = [10.0] * 20 + [11.0] * 20 + [500.0]
    rows = [("seg", i, v, _ts(0)) for i, v in enumerate(vals)]
    ev = spark.createDataFrame(rows, ["event_type", "event_id", "value", "ts"])
    out = zscore_outliers(ev)
    got = out.collect()
    assert [r["event_id"] for r in got] == [40]
    assert got[0]["cents"] == 50000
    # deviation numerator is positive for a high outlier
    assert got[0]["dev_milli"] > 0


def test_zscore_integer_predicate_matches_float_reference(spark):
    """The int64 algebra must agree with the plain float z-test away
    from the boundary (the algebra is exact; float is the reference)."""
    import random

    rng = random.Random(7)
    vals = [round(rng.gauss(50, 5), 2) for _ in range(500)]
    rows = [("s", i, v, _ts(0)) for i, v in enumerate(vals)]
    ev = spark.createDataFrame(rows, ["event_type", "event_id", "value", "ts"])
    flagged = {r["event_id"] for r in zscore_outliers(ev).collect()}
    cents = [int(v * 100 // 1) for v in vals]
    n = len(cents)
    s, q = sum(cents), sum(c * c for c in cents)
    expected = {
        i for i, c in enumerate(cents) if (n * c - s) ** 2 > 4 * (n * q - s * s)
    }
    assert flagged == expected


# ---------------------------------------------------------------------------
# mixture apportionment
# ---------------------------------------------------------------------------


def test_apportionment_sums_exactly_to_budget(spark):
    docs = [
        ("srcA", "one two three four five"),
        ("srcB", "one two three"),
        ("srcC", "one two"),
        ("srcC", "one"),
    ]
    df = spark.createDataFrame(docs, ["source", "text"])
    out = mixture_apportion(df, budget=100)
    rows = {r["source"]: r for r in out.collect()}
    assert sum(r["alloc"] for r in rows.values()) == 100
    # proportionality: quota ≤ exact share < quota + 1
    total = sum(r["tokens"] for r in rows.values())
    for r in rows.values():
        assert r["quota"] == (100 * r["tokens"]) // total
        assert r["extra"] in (0, 1)


def test_apportionment_largest_remainder_tiebreak(spark):
    """Equal remainders resolve by source name ascending — the
    deterministic tie rule both engines declare."""
    docs = [("b", "w w w"), ("a", "w w w")]  # identical supplies
    df = spark.createDataFrame(docs, ["source", "text"])
    rows = {r["source"]: r for r in mixture_apportion(df, budget=7).collect()}
    # 7*3//6 = 3 each, leftover 1 goes to 'a' (name asc)
    assert rows["a"]["alloc"] == 4 and rows["b"]["alloc"] == 3
