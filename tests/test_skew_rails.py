"""Round-9 skew-rail hardening (VERDICT r8 #1/#2 + ADVICE r8):

- ``dedup_skew_report`` makes every ``max_bucket`` rail (and winnow's
  ``max_df`` stop-fingerprint cap) OBSERVABLE — result-neutral on the
  harness corpus where nothing caps, nonzero counts on a hub corpus.
- ``cap_strategy="agg"`` is the hub-proof twin of the default window
  rail: a map-side-combinable groupBy count + broadcast LEFT ANTI join,
  byte-equal to the window formulation on capped and uncapped corpora,
  with the partial aggregation pinned in the plan.
- NULL-text documents are filtered BEFORE banding: an all-null MinHash
  signature used to band to md5("") via concat_ws's null-skipping, so
  every null doc collided into one shared hub bucket per band and
  entered the quadratic candidate join.
"""

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.dedup import (
    _cap_hub_buckets,
    _lsh_banded,
    dedup_skew_report,
    minhash_lsh_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_hamming_pairs,
)
from yandex_tracker_exporter_spark.operators.similarity import (
    auto_num_planes,
)

BOILER = "all work and no play makes jack a dull boy " * 4
BASE = "the quick brown fox jumps over the lazy dog " * 4


def _hub_corpus(spark, hub_n=40):
    rows = [(i, BOILER) for i in range(hub_n)]
    rows += [(100, BASE), (101, BASE)]  # exact dup pair outside the hub
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- window/agg twin

@pytest.mark.parametrize(
    "fn", [minhash_lsh_duplicates, simhash_hamming_pairs, ngram_jaccard_pairs]
)
def test_cap_strategies_byte_equal(spark, fn):
    """The agg rail must keep EXACTLY the rows the window rail keeps —
    on a corpus where the cap binds and on one where it does not."""
    hub = _hub_corpus(spark)
    for kw in (dict(max_bucket=10), dict(max_bucket=10_000)):
        win = sorted(map(tuple, fn(hub, cap_strategy="window", **kw).collect()))
        agg = sorted(map(tuple, fn(hub, cap_strategy="agg", **kw).collect()))
        assert win == agg, (fn.__name__, kw)
        if fn is minhash_lsh_duplicates and kw["max_bucket"] == 10:
            assert win == [(100, 101, 1.0)]  # hub dropped, real pair kept


def test_unknown_cap_strategy_raises(spark):
    df = _hub_corpus(spark, hub_n=2)
    with pytest.raises(ValueError, match="cap strategy"):
        minhash_lsh_duplicates(df, cap_strategy="bogus").collect()


def test_agg_rail_plan_partial_agg_and_broadcast_anti(spark):
    """The agg rail's scale contract: the over-cap key set comes from a
    map-side-combinable count (partial_count BEFORE the exchange — the
    hub collapses to one row per input partition) and is applied as a
    BROADCAST anti-join, never a shuffled one."""
    banded = _lsh_banded(
        minhash_signatures(_hub_corpus(spark)), "doc_id", 16, 4
    ).repartition("band_idx", "band_key")
    capped = _cap_hub_buckets(banded, ("band_idx", "band_key"), 10, "agg")
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- skew report

REPORT_COLS = [
    "method",
    "band_idx",
    "buckets",
    "capped_buckets",
    "rows_dropped",
    "max_bucket_size",
    "max_surviving_bucket",
    "recommended_planes",
]


@pytest.mark.parametrize("method", ["minhash", "ngram", "simhash"])
def test_skew_report_result_neutral_on_harness(documents_df, method):
    """On the harness documents table nothing caps at the default
    max_bucket rails: the report must show zero capped buckets and zero
    dropped rows — the observability layer never changes operator
    results."""
    rep = dedup_skew_report(documents_df.select("doc_id", "text"), method=method)
    assert rep.columns == REPORT_COLS
    rows = rep.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["method"] == method
        assert r["capped_buckets"] == 0 and r["rows_dropped"] == 0
        assert r["max_surviving_bucket"] == r["max_bucket_size"]
        assert r["buckets"] > 0


def test_skew_report_winnow_on_harness_reflects_stop_filter(documents_df):
    """Winnow's max_df is a SEMANTIC filter, not just a defensive rail:
    common boilerplate spans in the harness corpus legitimately exceed
    df=10 and the operator drops them by design. The report surfaces
    exactly that (nonzero, self-consistent) rather than pretending the
    corpus has no stop fingerprints."""
    (r,) = dedup_skew_report(
        documents_df.select("doc_id", "text"), method="winnow"
    ).collect()
    assert r["method"] == "winnow" and r["band_idx"] == 0
    assert r["capped_buckets"] > 0  # harness boilerplate IS over df=10
    assert r["rows_dropped"] > r["capped_buckets"] * 10  # >10 postings each
    assert r["max_surviving_bucket"] <= 10 < r["max_bucket_size"]


@pytest.mark.parametrize("method", ["minhash", "ngram", "simhash"])
def test_skew_report_counts_hub_drops(spark, method):
    """A 40-doc boilerplate hub over the cap: every band reports one
    capped bucket and exactly the hub's rows dropped — recall loss is
    now observable, matching the operator's actual drop."""
    hub = _hub_corpus(spark)
    rows = dedup_skew_report(hub, method=method, max_bucket=10).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["capped_buckets"] == 1, (method, r)
        assert r["rows_dropped"] == 40, (method, r)
        assert r["max_bucket_size"] == 40
        # the surviving max is the exact-dup pair's bucket (2) or a
        # singleton — never the hub
        assert r["max_surviving_bucket"] <= 2


def test_skew_report_uncapped_reports_zero_drops(spark):
    rows = dedup_skew_report(
        _hub_corpus(spark), method="minhash", max_bucket=None
    ).collect()
    for r in rows:
        assert r["capped_buckets"] == 0 and r["rows_dropped"] == 0
        assert r["max_bucket_size"] == 40 == r["max_surviving_bucket"]


def test_skew_report_winnow_stop_fingerprints(spark):
    """Winnow's max_df cap is the same rail class: a fingerprint shared
    by > max_df documents is a stop fingerprint; the report counts its
    postings as dropped."""
    rows_in = [(i, BOILER) for i in range(12)] + [(100, BASE), (101, BASE)]
    df = spark.createDataFrame(rows_in, "doc_id long, text string")
    (r,) = dedup_skew_report(df, method="winnow", max_df=10).collect()
    assert r["band_idx"] == 0
    # every boilerplate fingerprint appears in 12 > 10 docs → capped
    assert r["capped_buckets"] > 0
    assert r["rows_dropped"] >= 12 * 1
    assert r["max_surviving_bucket"] <= 10


def test_skew_report_unknown_method_raises(spark):
    with pytest.raises(ValueError, match="unknown method"):
        dedup_skew_report(_hub_corpus(spark, hub_n=2), method="md5")


# ------------------------------------------------- null-text hub fix

def test_null_text_docs_never_enter_banding(spark):
    """ADVICE r8: band_hash over an all-NULL signature is md5("") —
    every null-text doc used to collide into ONE hub bucket per band
    and enter the quadratic candidate join (bounded only by
    max_bucket). Null docs must be filtered BEFORE banding."""
    rows = [(i, None) for i in range(50)] + [(100, BASE), (101, BASE)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    banded = _lsh_banded(minhash_signatures(df), "doc_id", 16, 4)
    ids = {r["doc_id"] for r in banded.select("doc_id").distinct().collect()}
    assert ids == {100, 101}
    # and the report sees no null hub: largest bucket is the real pair
    for method in ("minhash", "simhash", "ngram"):
        rep = dedup_skew_report(df, method=method).collect()
        assert all(r["max_bucket_size"] <= 2 for r in rep), method
    # operator results unchanged: the real pair, nothing else
    got = {(r["a_id"], r["b_id"]) for r in minhash_lsh_duplicates(df).collect()}
    assert got == {(100, 101)}


# ------------------------------------------------- basket-width rail

def test_copurchase_basket_width_rail(spark):
    """VERDICT r8 #7: the co-purchase order-key self-join is quadratic
    in basket size. Baskets over COPURCHASE_MAX_BASKET drop before the
    join; pairs from normal baskets are unchanged, and None disables."""
    from __spark_entry__ import _copurchase_pairs

    rows = [(1, p) for p in range(50)]          # one 50-item mega-basket
    rows += [(2, 900), (2, 901)]                # a normal 2-item basket
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    capped = {
        (r["p1"], r["p2"])
        for r in _copurchase_pairs(li, max_basket=10).collect()
    }
    assert capped == {(900, 901), (901, 900)}
    uncapped = _copurchase_pairs(li, max_basket=None).collect()
    assert len(uncapped) == 50 * 49 + 2  # mega-basket pairs all present


def test_copurchase_pairs_explode_matches_self_join(spark):
    """r12 batch 6 measured a collect_list + map-side pair-explode
    variant of _copurchase_pairs and REJECTED it on paired solo A/B
    (4.10 s vs the join's 2.53 s best at sf0.1 — interpreted HOF pair
    generation loses to the codegen'd broadcast join here). This pin
    keeps the twin's SEMANTIC equality proven — pair multiset equal to
    the production join on every divergence-prone shape: duplicate
    parts in one basket (multiplicities multiply), NULL parts (pair on
    neither path), a basket exactly at the cap, one over it by a NULL
    row only (the rail counts ALL rows, NULLs included), and
    single-item baskets — so the variant stays available if scale ever
    tips the balance (it shuffles the corpus once, not twice)."""
    from __spark_entry__ import _copurchase_pairs

    def _explode_path(li, max_basket):
        baskets = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
            F.collect_list("l_partkey").alias("_ps"),
            F.count(F.lit(1)).alias("_bn"),
        )
        if max_basket is not None:
            baskets = baskets.where(F.col("_bn") <= max_basket)
        pair_sql = (
            "flatten(transform(_ps, x -> "
            "transform(filter(_ps, y -> y != x), "
            "y -> named_struct('p1', x, 'p2', y))))"
        )
        return (
            baskets.select(F.explode(F.expr(pair_sql)).alias("_pp"))
            .select(F.col("_pp.p1").alias("p1"), F.col("_pp.p2").alias("p2"))
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("n_together"))
        )

    rows = [
        (1, 10), (1, 10), (1, 20), (1, 30),   # duplicate part in basket
        (2, 40), (2, None), (2, 50),          # NULL part among real ones
        (3, 60),                              # single-item basket
        (4, 70), (4, 71), (4, 72), (4, 73),   # exactly at cap 4
        (5, 80), (5, 81), (5, 82), (5, 83), (5, None),  # over cap 4 via NULL row
        (6, None), (6, None),                 # all-NULL basket
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    for cap in (4, None):
        got = sorted(map(tuple, _copurchase_pairs(li, max_basket=cap).collect()))
        want = sorted(map(tuple, _explode_path(li, cap).collect()))
        assert got == want, cap


def test_copurchase_edges_explode_matches_self_join(spark):
    """r12 batch 6: _copurchase_edges got the same join→explode
    rewrite (y > x). Edge MULTISET must equal the verbatim old
    p1 < p2 self-join on the harness corpus (real basket shapes,
    shipdate filter applied) — multiplicities included."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(tuple, m._copurchase_edges(spark, sf).collect())
    )
    li = (
        m._t(spark, sf, "lineitem")
        .where(F.col("l_shipdate").between("1995-01-01", "1995-12-31"))
        .select("l_orderkey", "l_partkey")
    )
    left = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    right = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    want = sorted(
        map(
            tuple,
            left.join(right, "ok")
            .where(F.col("p1") < F.col("p2"))
            .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
            .collect(),
        )
    )
    assert got == want


def test_copurchase_default_rail_never_binds_on_harness(spark):
    """The default cap (1000) must be result-neutral on TPC-H-shaped
    data (basket width <= 7) — byte-equal to the uncapped run."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    li = m._t_wide(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    want = sorted(map(tuple, m._copurchase_pairs(li, max_basket=None).collect()))
    got = sorted(map(tuple, m._copurchase_pairs(li).collect()))
    assert got == want


def test_copurchase_rail_observable_via_hub_cap_report(spark):
    """No silent caps, extended to the basket rail (the report family's
    last uncovered rail): hub_cap_report over the same (order-key)
    relation _copurchase_pairs caps on — zero drops on a normal
    corpus, and on a mega-basket corpus the reported rows_dropped is
    exactly the over-cap order's row count the rail suppresses."""
    from __spark_entry__ import COPURCHASE_MAX_BASKET
    from yandex_tracker_exporter_spark.operators.dedup import hub_cap_report

    rows = [(1, p) for p in range(50)] + [(2, 900), (2, 901)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    rel = li.select(F.col("l_orderkey").alias("ok"))
    capped = hub_cap_report(rel, ("ok",), 10, "basket").collect()
    assert len(capped) == 1
    r = capped[0]
    assert (r["method"], r["band_idx"]) == ("basket", 0)
    assert r["buckets"] == 2
    assert r["capped_buckets"] == 1
    assert r["rows_dropped"] == 50  # the mega-basket's rows, exactly
    assert r["max_bucket_size"] == 50
    assert r["max_surviving_bucket"] == 2
    # default cap on TPC-H-shaped data: nothing drops
    import __spark_entry__ as m

    li_h = m._t_wide(spark, "/root/testdata/sf0.001", "lineitem").select(
        F.col("l_orderkey").alias("ok")
    )
    r2 = hub_cap_report(
        li_h, ("ok",), COPURCHASE_MAX_BASKET, "basket"
    ).collect()[0]
    assert r2["capped_buckets"] == 0 and r2["rows_dropped"] == 0
    # the synthetic harness allows wider baskets than TPC-H's 7 (12 at
    # sf0.001) — the invariant is that the default rail never binds
    assert r2["max_bucket_size"] < COPURCHASE_MAX_BASKET


# ------------------------------------------------- embedding hub rail

def _vec_corpus(spark, hub_n=40, dim=16, seed=7):
    """hub_n byte-identical vectors (the re-encoded-dup hub) + random
    singles + one planted near-identical pair (200, 201)."""
    import random

    rng = random.Random(seed)
    hub = [round(rng.uniform(-1, 1), 6) for _ in range(dim)]
    rows = [(i, hub) for i in range(hub_n)]
    rows += [
        (100 + i, [round(rng.uniform(-1, 1), 6) for _ in range(dim)])
        for i in range(10)
    ]
    near = [round(rng.uniform(-1, 1), 6) for _ in range(dim)]
    near2 = list(near)
    near2[0] = near2[0] * 0.5
    rows += [(200, near), (201, near2)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_hub_rail_and_twin(spark):
    """Byte-identical embeddings (a re-encoded dup hub) collide in
    EVERY band: the self-join goes quadratic in the hub without the
    cap. Capped runs keep the planted pair, drop the hub, and the two
    cap strategies stay byte-equal."""
    from yandex_tracker_exporter_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    df = _vec_corpus(spark)
    kw = dict(threshold=0.9, num_planes=6, num_bands=4, dim=16)
    capped = {
        (r["a_id"], r["b_id"])
        for r in cosine_neardup_pairs(df, max_bucket=10, **kw).collect()
    }
    assert (200, 201) in capped
    assert not any(a < 40 and b < 40 for a, b in capped)  # hub dropped
    agg = {
        (r["a_id"], r["b_id"])
        for r in cosine_neardup_pairs(
            df, max_bucket=10, cap_strategy="agg", **kw
        ).collect()
    }
    assert agg == capped
    uncapped = {
        (r["a_id"], r["b_id"])
        for r in cosine_neardup_pairs(df, max_bucket=None, **kw).collect()
    }
    assert (200, 201) in uncapped
    assert sum(1 for a, b in uncapped if a < 40 and b < 40) == 40 * 39 // 2


def test_embedding_skew_report_and_saturation_gauge(spark):
    """method="embedding" reports the sign-LSH buckets the operator
    joins on: the 40-vector hub shows as one capped bucket per band
    with 40 rows dropped; max_bucket_size is the saturation gauge."""
    df = _vec_corpus(spark)
    rows = dedup_skew_report(
        df, method="embedding", content_col="embedding", id_col="vec_id",
        max_bucket=10, num_planes=6, num_bands=4, dim=16,
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["capped_buckets"] >= 1
        assert r["rows_dropped"] >= 40
        assert r["max_bucket_size"] >= 40
        # VERDICT r10 #6: the gauge states the remedy — the operating
        # point for THIS corpus (52 usable vectors -> the clamp floor)
        assert r["recommended_planes"] == auto_num_planes(52)


def test_skew_report_recommended_planes_twin_and_nulls(spark, documents_df):
    """The report's recommended_planes expression (bit_length-1-3,
    clamped) must equal auto_num_planes at ANY n — asserted over the
    clamp floor, both clamp edges, powers of two, and astronomic n
    where float log2 could misround — and non-embedding methods carry
    NULL (the recommendation is sign-LSH-specific)."""
    for n in (1, 2, 7, 8, 52, 8191, 8192, 400_000, 2**28, 2**31 - 1,
              2**31 + 7, 2**45):
        got = spark.sql(
            "SELECT greatest(10, least(28, "
            f"length(conv(CAST({n} AS STRING), 10, 2)) - 1 - 3)) AS p"
        ).first()["p"]
        assert got == auto_num_planes(n), n
    rep = dedup_skew_report(
        documents_df.select("doc_id", "text"), method="minhash"
    )
    assert rep.columns == REPORT_COLS
    assert all(r["recommended_planes"] is None for r in rep.collect())


def test_recommended_planes_counts_raw_rows_like_auto(spark):
    """ADVICE r11: the report's recommended_planes must be
    auto_num_planes over the SAME n that cosine_neardup_pairs
    (num_planes="auto") counts — the RAW input row count, pre-
    quarantine (similarity.py counts embeddings rows before the
    usability filter). Pinned at the one place they can diverge: a
    corpus whose raw count sits exactly on a bit-length boundary
    (16384 -> 11 planes) while the post-quarantine count falls below
    it (16380 -> 10 planes). Counting banded usable rows here (the
    pre-fix behavior) recommends 10 — a plane count "auto" would not
    actually pick."""
    import random

    rng = random.Random(3)
    dim = 8
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(dim)])
        for i in range(16380)
    ]
    rows += [(20000 + j, None) for j in range(4)]  # junk: quarantined
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    assert auto_num_planes(16384) == 11 and auto_num_planes(16380) == 10
    rep = dedup_skew_report(
        df, method="embedding", content_col="embedding", id_col="vec_id",
        num_planes=6, num_bands=2, dim=dim,
    ).collect()
    assert rep and all(r["recommended_planes"] == 11 for r in rep)
