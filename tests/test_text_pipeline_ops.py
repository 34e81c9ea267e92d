"""Unit tests for the round-3 training-pipeline additions:
repetition signals, deterministic hash sampling, TF-IDF top terms, and
distributed global row numbering."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.partitioning import global_row_number
from yandex_tracker_exporter_spark.operators.text_analysis import (
    hash_sample,
    repetition_signals,
    tfidf_top_terms,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestRepetitionSignals:
    def test_known_counts(self, spark):
        df = _docs(spark, ["a a a b"])
        row = repetition_signals(df).collect()[0]
        assert row.n_tokens == 4
        assert row.n_distinct_tokens == 2
        assert row.top_token_count == 3
        # bigrams: "a a", "a a", "a b" → top bigram "a a" twice of 3
        assert row.top_bigram_count == 2
        assert row.dup_token_ratio == pytest.approx(0.5)
        assert row.top_bigram_ratio == pytest.approx(2 / 3)

    def test_single_token_doc_has_no_bigrams(self, spark):
        row = repetition_signals(_docs(spark, ["solo"])).collect()[0]
        assert row.n_tokens == 1
        assert row.top_bigram_count == 0
        assert row.top_bigram_ratio == 0.0
        assert row.dup_token_ratio == 0.0

    def test_fully_repeated_doc(self, spark):
        row = repetition_signals(_docs(spark, ["x x x x x"])).collect()[0]
        assert row.dup_token_ratio == pytest.approx(0.8)
        assert row.top_bigram_ratio == pytest.approx(1.0)


class TestHashSample:
    def test_deterministic_across_runs(self, spark, documents_df):
        a = sorted(r.doc_id for r in hash_sample(documents_df).collect())
        b = sorted(r.doc_id for r in hash_sample(documents_df).collect())
        assert a == b and len(a) > 0

    def test_buckets_within_keep(self, spark, documents_df):
        out = hash_sample(documents_df, buckets=100, keep=10)
        assert out.where(F.col("sample_bucket") >= 10).count() == 0

    def test_rate_roughly_keep_over_buckets(self, spark, documents_df):
        total = documents_df.count()
        kept = hash_sample(documents_df, buckets=100, keep=10).count()
        assert 0.03 * total < kept < 0.25 * total

    def test_salt_gives_independent_family(self, spark, documents_df):
        a = {r.doc_id for r in hash_sample(documents_df, salt="s1:").collect()}
        b = {r.doc_id for r in hash_sample(documents_df, salt="s2:").collect()}
        assert a != b

    def test_keeps_all_input_columns(self, spark, documents_df):
        out = hash_sample(documents_df)
        assert set(documents_df.columns) | {"sample_bucket"} == set(out.columns)


class TestStratifiedSample:
    def test_rate_two_duplicates_every_row(self, spark, documents_df):
        from yandex_tracker_exporter_spark.operators.text_analysis import (
            stratified_sample,
        )

        de = documents_df.where(F.col("lang") == "de")
        out = stratified_sample(de, "lang", {"de": 2.0})
        assert out.count() == 2 * de.count()
        assert set(
            r.copy_idx for r in out.select("copy_idx").distinct().collect()
        ) == {0, 1}

    def test_fractional_rate_downsamples_deterministically(
        self, spark, documents_df
    ):
        from yandex_tracker_exporter_spark.operators.text_analysis import (
            stratified_sample,
        )

        out = stratified_sample(documents_df, "lang", {}, default_rate=0.5)
        total = documents_df.count()
        kept = out.count()
        assert 0.3 * total < kept < 0.7 * total
        again = stratified_sample(documents_df, "lang", {}, default_rate=0.5)
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_rate_zero_drops_group(self, spark, documents_df):
        from yandex_tracker_exporter_spark.operators.text_analysis import (
            stratified_sample,
        )

        out = stratified_sample(documents_df, "lang", {"en": 0.0})
        assert out.where(F.col("lang") == "en").count() == 0
        # other groups untouched (default rate 1.0, one copy each)
        others = documents_df.where(F.col("lang") != "en").count()
        assert out.count() == others

    def test_mixed_rates_expected_multiplicity(self, spark, documents_df):
        from yandex_tracker_exporter_spark.operators.text_analysis import (
            stratified_sample,
        )

        out = stratified_sample(
            documents_df, "lang", {"de": 1.5}, default_rate=1.0
        )
        de_in = documents_df.where(F.col("lang") == "de").count()
        de_out = out.where(F.col("lang") == "de").count()
        assert de_in <= de_out <= 2 * de_in
        assert de_out / de_in == pytest.approx(1.5, abs=0.35)


class TestTfidfTopTerms:
    def test_tiny_corpus(self, spark):
        df = _docs(spark, ["x x y", "y z z"])
        rows = {
            (r.doc_id, r.rank): (r.term, r.tf, r.df)
            for r in tfidf_top_terms(df, top_k=2).collect()
        }
        # doc 0: x has tf=2 df=1 → rank 1; y tf=1 df=2 → rank 2
        assert rows[(0, 1)] == ("x", 2, 1)
        assert rows[(0, 2)] == ("y", 1, 2)
        # doc 1: z tf=2 df=1 → rank 1
        assert rows[(1, 1)] == ("z", 2, 1)

    def test_df_tiebreak_prefers_rarer_term(self, spark):
        # both terms tf=1 in doc 0; "rare" df=1 vs "common" df=2
        df = _docs(spark, ["rare common", "common"])
        top = (
            tfidf_top_terms(df, top_k=1)
            .where(F.col("doc_id") == 0)
            .collect()[0]
        )
        assert top.term == "rare"


class TestGlobalRowNumber:
    def test_matches_single_partition_row_number(self, spark, documents_df):
        order = [F.col("n_chars").asc(), F.col("doc_id").asc()]
        got = global_row_number(
            documents_df.select("doc_id", "n_chars"),
            order,
            F.floor(F.col("n_chars") / F.lit(64)),
        )
        want = documents_df.select(
            "doc_id",
            "n_chars",
            F.row_number().over(Window.orderBy(*order)).cast("long").alias(
                "global_rank"
            ),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_degenerate_single_bucket_still_correct(self, spark, documents_df):
        got = global_row_number(
            documents_df.select("doc_id"),
            [F.col("doc_id").asc()],
            F.lit(0),
        )
        ranks = {r.doc_id: r.global_rank for r in got.collect()}
        for i, doc_id in enumerate(sorted(ranks), start=1):
            assert ranks[doc_id] == i


def test_stratified_sample_rejects_negative_rates(spark, documents_df):
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        stratified_sample,
    )

    with pytest.raises(ValueError):
        stratified_sample(documents_df, "lang", {"en": -0.5})
    with pytest.raises(ValueError):
        stratified_sample(documents_df, "lang", {}, default_rate=-1.0)


def test_duplicated_window_ratio_planted_boilerplate(spark):
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        duplicated_window_ratio,
    )

    boiler = " ".join(f"b{i}" for i in range(16))  # one exact 16-token window
    uniq = lambda d: " ".join(f"u{d}_{i}" for i in range(16))
    rows = [
        (1, boiler + " " + uniq(1)),   # windows: [boiler][uniq1] -> 1 of 2 dup
        (2, boiler + " " + uniq(2)),   # same
        (3, uniq(3)),                  # no dup windows
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ratio)
           for r in duplicated_window_ratio(df).collect()}
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (1, 0, 0.0)
