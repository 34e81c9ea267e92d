"""Tests for the HLL sketch, split assignment, length bucketing, and
label centroids added in round 4."""

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.clustering import label_centroids
from yandex_tracker_exporter_spark.operators.sketches import (
    HLL_M,
    HLL_RHO_MAX,
    cms_counters,
    cms_estimate,
    hll_distinct,
)
from yandex_tracker_exporter_spark.operators.text_analysis import (
    length_buckets,
    split_assign,
    token_counts,
)
from yandex_tracker_exporter_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- HLL


def test_hll_accuracy_synthetic(spark):
    """5000 distinct synthetic keys estimate within the m=64 error bar
    (1.04/sqrt(64) ≈ 13%; floor set at 25% for slack)."""
    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.concat(F.lit("key-"), F.col("id")).alias("v")
    )
    [(est,)] = hll_distinct(df, "v", ["g"], out_col="e").select("e").collect()
    assert abs(est - 5000) / 5000 < 0.25, est


def test_hll_duplicates_do_not_move_estimate(spark):
    """The sketch depends only on the distinct value set: 10 copies of
    every key produce the identical estimate."""
    base = spark.range(2000).select(
        F.lit("g").alias("g"), F.concat(F.lit("k"), F.col("id")).alias("v")
    )
    dup = base.crossJoin(spark.range(10).select(F.lit(1).alias("_x"))).select(
        "g", "v"
    )
    [(e1,)] = hll_distinct(base, "v", ["g"], out_col="e").select("e").collect()
    [(e2,)] = hll_distinct(dup, "v", ["g"], out_col="e").select("e").collect()
    assert e1 == e2


def test_hll_groups_are_independent(spark):
    """Per-group registers: a group's estimate is unaffected by other
    groups sharing the DataFrame."""
    a = spark.range(1000).select(
        F.lit("a").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    b = spark.range(3).select(
        F.lit("b").alias("g"), F.concat(F.lit("y"), F.col("id")).alias("v")
    )
    together = {
        r["g"]: r["e"]
        for r in hll_distinct(a.union(b), "v", ["g"], out_col="e").collect()
    }
    [(alone,)] = hll_distinct(a, "v", ["g"], out_col="e").select("e").collect()
    assert together["a"] == alone


def test_hll_register_bounds(spark):
    """Internal invariant: the scaled register sum is always within
    (0, m * 2^rho_max] so the int64 arithmetic can never overflow."""
    df = spark.range(100000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    [(est,)] = hll_distinct(df, "v", ["g"], out_col="e").select("e").collect()
    # estimate can never exceed alpha * m^2 * 2^26 / m (all registers
    # saturated) nor drop below alpha * m (all registers empty-ish)
    assert 0 < est < HLL_M * (1 << HLL_RHO_MAX)


# ------------------------------------------------------- split_assign


def test_split_assign_partitions_everything(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = split_assign(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    # 90/5/5 targets; hash noise at 500 docs stays within a wide band
    total = sum(counts.values())
    assert counts["train"] / total > 0.8


def test_split_assign_deterministic_and_salt_sensitive(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id").collect()}
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs, "doc_id", salt="fold2:").collect()
    }
    assert a != c  # an independent split family


# ----------------------------------------------------- length_buckets


def test_length_buckets_cover_and_waste(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = length_buckets(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["ceiling"] == (1 << r["bucket"]) - 1
        assert r["pad_waste"] >= 0
        # every doc in the bucket is ≤ ceiling, so total tokens + waste
        # is exactly n_docs * ceiling
        assert r["sum_tokens"] + r["pad_waste"] == r["n_docs"] * r["ceiling"]


def test_length_buckets_match_token_counts(spark):
    """Cross-check the bucket assignment against token_counts: each
    doc's ws_tokens must satisfy 2^(b-1) ≤ t ≤ 2^b - 1."""
    docs = load_table(spark, SF_DIR, "documents")
    toks = {r["doc_id"]: r["ws_tokens"] for r in token_counts(docs).collect()}
    buckets = {b["bucket"]: b for b in length_buckets(docs).collect()}
    import collections
    expect = collections.Counter(
        t.bit_length() if t > 0 else 0 for t in toks.values()
    )
    got = {b: r["n_docs"] for b, r in buckets.items()}
    assert got == dict(expect)


# ---------------------------------------------------- label_centroids


def test_label_centroids_shape_and_invariants(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = label_centroids(emb).collect()
    n_labels = emb.select("label").distinct().count()
    dim = len(emb.select("embedding").first()[0])
    assert len(out) == n_labels * dim
    per_label = {}
    for r in out:
        assert -127_000 <= r["centroid_milli"] <= 127_000
        # exact floor-division invariant
        assert (
            r["centroid_milli"] * r["n_vecs"]
            <= 1000 * r["code_sum"]
            < (r["centroid_milli"] + 1) * r["n_vecs"]
        )
        per_label.setdefault(r["label"], set()).add(r["n_vecs"])
    # every dim of a label sees the same vector count
    for label, ns in per_label.items():
        assert len(ns) == 1, (label, ns)


def test_label_centroids_single_vector_identity(spark):
    """A label with one vector: centroid_milli == 1000 * its own code."""
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0], 7)], "vec_id long, embedding array<float>, label int"
    )
    rows = {r["dim"]: r for r in label_centroids(df).collect()}
    assert rows[0]["centroid_milli"] == 127_000
    assert rows[1]["centroid_milli"] == -63_000  # floor(-0.5*127 + 0.5) = -63
    assert rows[2]["centroid_milli"] == 0


# ---------------------------------------------------------------------------
# KMV (bottom-k) intersection sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """With fewer than k distinct values per group the sketch IS the
    full hashed set, so union/intersection estimates are exact counts
    (theta = max hash observed ≈ full-range scaling cancels collapse):
    the small-regime behavior is pinned, not hidden."""
    from pyspark.sql import functions as F

    from yandex_tracker_exporter_spark.operators.sketches import (
        kmv_bottom_k,
        kmv_intersection_estimates,
    )

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(15, 45)]
    df = spark.createDataFrame(rows, ["event_type", "user_id"])
    sk = kmv_bottom_k(df, "user_id", "event_type", k=64)
    out = kmv_intersection_estimates(sk, k=64).collect()
    assert len(out) == 1
    r = out[0]
    # below k the merged sample is the whole union: the sample Jaccard
    # is exact, so est_inter == floor(est_union * 15/45)
    assert 0 <= r["est_union"] * 15 - r["est_inter"] * 45 < 45


def test_kmv_estimates_track_exact_on_harness(spark):
    """At sf0.001 the per-type distinct-user counts exceed k: estimates
    must land within 40% of exact (k=64 ⇒ ~1/8 relative error typical;
    the floor here is deliberately loose but fails on any logic bug)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["kmv_intersection"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["est_inter"] >= 0
        if r["exact_inter"] >= 50:
            assert abs(r["est_inter"] - r["exact_inter"]) <= 0.4 * r["exact_inter"], r


def test_hll_union_estimates_track_exact(spark):
    """Register max-merge must estimate |A ∪ B| within the HLL error
    envelope (loose 40% floor at m=64 — fails on any merge-logic bug;
    typical error is ~5-10%). Runs at sf0.01: below ~2.5·m distinct the
    raw estimator carries its documented small-range positive bias
    (linear counting deliberately omitted for cross-engine parity), so
    the envelope only applies above that floor."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["hll_union"](
        spark, "/root/testdata/sf0.1"
    ).collect()
    assert len(rows) == 10  # 5 types → 10 pairs
    checked = 0
    for r in rows:
        if r["exact_union"] >= 160:  # 2.5 * m
            assert (
                abs(r["est_union"] - r["exact_union"]) <= 0.4 * r["exact_union"]
            ), r
            checked += 1
    assert checked, "fixture too small to exercise the calibrated regime"


def test_hll_union_merge_equals_direct_union_sketch(spark):
    """The mergeability law itself: max-merging two groups' registers
    must give the IDENTICAL estimate as sketching the concatenated
    values directly — not just a close one."""
    from pyspark.sql import functions as F

    from yandex_tracker_exporter_spark.operators.sketches import (
        hll_distinct,
        hll_union_pairs,
    )

    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(300, 900)]
    df = spark.createDataFrame(rows, ["event_type", "user_id"])
    merged = hll_union_pairs(df, "user_id", "event_type").collect()[0]
    direct = hll_distinct(
        df.select(F.lit("u").alias("g"), "user_id"), "user_id", ["g"],
        out_col="est",
    ).collect()[0]
    assert merged["est_union"] == direct["est"]


def test_hll_small_range_linear_counting(spark):
    """Round-9 accuracy fix (Flajolet et al. 2007 §4): the raw m=64
    estimator is ~3-45x biased below 5/2*m — a single-value group used
    to estimate 45 and a 2-distinct group 46. Linear counting over the
    zero-register count takes over there, via a precomputed integer
    table so no engine evaluates ln() at runtime."""
    for n in (1, 2, 5, 15, 50, 100):
        df = spark.range(n).select(
            F.lit("g").alias("g"),
            F.concat(F.lit("key-"), F.col("id")).alias("v"),
        )
        [(est,)] = hll_distinct(df, "v", ["g"], out_col="e").select("e").collect()
        assert abs(est - n) <= max(2, int(0.25 * n)), (n, est)


def test_hll_lc_table_matches_formula():
    import math

    from yandex_tracker_exporter_spark.operators.sketches import (
        HLL_LC_TABLE,
        HLL_M,
    )

    assert len(HLL_LC_TABLE) == HLL_M - 1
    for v in (1, 7, 32, 63):
        assert HLL_LC_TABLE[v - 1] == math.floor(HLL_M * math.log(HLL_M / v))


def test_cms_null_terms_never_enter_counters(spark):
    """A NULL term used to land depth phantom (salt, bucket=NULL) rows
    in the counter state; real terms' estimates were unaffected but
    the junk rode every merge."""
    tc = spark.createDataFrame(
        [("a", 3), (None, 7), ("b", 2)], "term string, cnt long"
    )
    rows = cms_counters(tc).collect()
    assert all(r["bucket"] is not None for r in rows)
    est = {
        r["term"]: r["est_cnt"]
        for r in cms_estimate(
            spark.createDataFrame([("a",), ("b",)], "term string"), cms_counters(tc)
        ).collect()
    }
    assert est["a"] >= 3 and est["b"] >= 2
