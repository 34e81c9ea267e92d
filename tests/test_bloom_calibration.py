"""Tests for bloom_semi_join and minhash_calibration."""

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.bloom import bloom_semi_join
from yandex_tracker_exporter_spark.operators.dedup import minhash_calibration
from yandex_tracker_exporter_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------ bloom_semi_join


def test_bloom_no_false_negatives(spark):
    """Every true member must survive the filter (the Bloom guarantee)."""
    corpus = spark.range(1, 5001).select(F.col("id").alias("k"))
    keys = spark.range(1, 5001).where("id % 37 = 0").select(
        F.col("id").alias("key")
    )
    out = {r["k"] for r in bloom_semi_join(corpus, "k", keys, "key").collect()}
    truth = {r["key"] for r in keys.collect()}
    assert truth <= out


def test_bloom_false_positive_rate_bounded(spark):
    """FP rate stays in the theoretical ballpark (<5% at n≈135, m=4096)."""
    corpus = spark.range(1, 5001).select(F.col("id").alias("k"))
    keys = spark.range(1, 5001).where("id % 37 = 0").select(
        F.col("id").alias("key")
    )
    out = {r["k"] for r in bloom_semi_join(corpus, "k", keys, "key").collect()}
    truth = {r["key"] for r in keys.collect()}
    fp = len(out - truth)
    assert fp / 5000 < 0.05, fp


def test_bloom_text_keys_path(spark):
    corpus = spark.range(1, 2001).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    keys = spark.range(1, 2001).where("id % 50 = 0").select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    out = {
        r["k"]
        for r in bloom_semi_join(
            corpus, "k", keys, "key", text_keys=True
        ).collect()
    }
    truth = {r["key"] for r in keys.collect()}
    assert truth <= out
    assert len(out) < 2000  # actually filters something


def test_bloom_empty_filter_side_drops_everything(spark):
    corpus = spark.range(1, 101).select(F.col("id").alias("k"))
    keys = spark.range(0).select(F.col("id").alias("key"))
    assert bloom_semi_join(corpus, "k", keys, "key").count() == 0


def test_bloom_missing_column_raises_named_error(spark):
    """ADVICE r8: a misspelled column used to classify as dtype "" →
    numeric and surface as the confusing "type classes disagree"
    TypeError; it must raise a column-not-found error NAMING the
    column instead."""
    import pytest

    corpus = spark.range(5).select(F.col("id").alias("k"))
    keys = spark.range(3).select(F.col("id").alias("key"))
    with pytest.raises(ValueError, match="no column 'kay'"):
        bloom_semi_join(corpus, "kay", keys, "key")
    with pytest.raises(ValueError, match="no column 'keey'"):
        bloom_semi_join(corpus, "k", keys, "keey")


def test_bloom_plan_corpus_never_shuffles(spark):
    """The probe side must stay exchange-free: broadcast semi-joins
    only (no Exchange on the corpus lineage)."""
    corpus = load_table(spark, SF_DIR, "lineitem").select("l_partkey")
    keys = load_table(spark, SF_DIR, "part").where("p_size = 1").select(
        "p_partkey"
    )
    plan = (
        bloom_semi_join(corpus, "l_partkey", keys, "p_partkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "Exchange hashpartitioning" not in plan


# -------------------------------------------------- minhash_calibration


def test_calibration_identical_docs_score_1000(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "the quick brown fox jumps over the lazy dog again"),
         (3, "completely different words entirely unrelated text here")],
        "doc_id long, text string",
    )
    rows = {(r["a_id"], r["b_id"]): r for r in
            minhash_calibration(df).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["est_milli"] == 1000
    assert r["exact_milli"] == 1000
    assert r["err_milli"] == 0


def test_calibration_error_is_bounded_on_corpus(spark):
    """k=16 gives sd ≈ 125 milli at J=0.5; assert the mean error over
    the harness candidates stays under 2 sd."""
    docs = load_table(spark, SF_DIR, "documents")
    rows = minhash_calibration(docs).collect()
    assert rows, "no candidate pairs at sf0.001?"
    for r in rows:
        assert 0 <= r["est_milli"] <= 1000
        assert 0 <= r["exact_milli"] <= 1000
        assert r["err_milli"] == abs(r["est_milli"] - r["exact_milli"])
    mean_err = sum(r["err_milli"] for r in rows) / len(rows)
    assert mean_err < 250, mean_err


def test_calibration_est_matches_lsh_operator(spark):
    """est_milli must equal floor(1000 * est_jaccard) from
    minhash_lsh_duplicates for the shared pairs."""
    from yandex_tracker_exporter_spark.operators.dedup import (
        minhash_lsh_duplicates,
    )

    docs = load_table(spark, SF_DIR, "documents")
    cal = {(r["a_id"], r["b_id"]): r["est_milli"]
           for r in minhash_calibration(docs).collect()}
    lsh = {(r["a_id"], r["b_id"]): r["est_jaccard"]
           for r in minhash_lsh_duplicates(docs, threshold=0.0).collect()}
    shared = set(cal) & set(lsh)
    assert shared
    for pair in shared:
        assert cal[pair] == int(lsh[pair] * 1000 + 1e-9)


def test_bloom_text_fp_rate_matches_theory(spark):
    """The text hash family must behave like k independent hashes: with
    n=380 members and m=4096 the theoretical FP rate at k=3 is ~1.3%.
    The old prefix-salt family was affine across salts — one row's
    collision implied all three, collapsing FP toward n/m ≈ 9%."""
    n, m = 380, 4096
    keys = spark.createDataFrame(
        [(f"member-{i}",) for i in range(n)], "key string"
    )
    probe_n = 4000
    corpus = spark.createDataFrame(
        [(f"outsider-{i}",) for i in range(probe_n)], "k string"
    )
    fp = bloom_semi_join(
        corpus, "k", keys, "key", m_bits=m, text_keys=True
    ).count() / probe_n
    assert fp < 0.04, f"text-key FP rate {fp:.3f} far above theory (~0.013)"
