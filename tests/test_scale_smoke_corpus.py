"""Corpus-scale smoke: the dedup/ANN operator family at ~10× the bench
corpus, all data generated distributed (spark.range + expressions, no
driver loops). Catches quadratic candidate blowups, partition-count
pathologies, and driver-side materialization that small fixtures hide.
"""

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_duplicates,
    winnow_duplicate_pairs,
)
from yandex_tracker_exporter_spark.operators.similarity import (
    cosine_neardup_pairs,
)

N_DOCS = 30_000
N_PLANTED = 300  # doc_id >= N_DOCS are exact copies of doc_id - N_DOCS


@pytest.fixture(scope="module")
def corpus(spark):
    """30k synthetic docs (~40 tokens each from a 5000-token vocabulary,
    so character spans are mostly document-unique — the property real
    crawled text has) + 300 planted exact copies.

    A degenerate tiny vocabulary (first attempt: 30 words) makes EVERY
    span boilerplate at volume — winnowing's stop-fingerprint cap then
    correctly filters everything, which is the designed behavior, not a
    bug; span dedup needs span entropy to have signal."""
    base = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id") * F.lit(101) + i), F.lit(5000)
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    copies = base.where(F.col("doc_id") < N_PLANTED).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"), "text"
    )
    return base.unionAll(copies).repartition(32)


def test_exact_dedup_at_volume(spark, corpus):
    out = exact_dedup(corpus, "text", "doc_id")
    groups = out.where(F.col("dup_count") >= 2).count()
    # every planted copy collapses with its source (plus any natural
    # hash-text collisions, which only add groups)
    assert groups >= N_PLANTED
    assert out.count() <= N_DOCS + N_PLANTED


def test_minhash_finds_planted_copies_at_volume(spark, corpus):
    pairs = minhash_lsh_duplicates(corpus, "text", "doc_id", threshold=0.9)
    got = {
        (r["a_id"], r["b_id"])
        for r in pairs.where(
            (F.col("b_id") - F.col("a_id")) == N_DOCS
        ).collect()
    }
    # exact copies share every shingle -> every band collides -> all found
    assert len(got) == N_PLANTED
    # candidate volume stays bounded: output pairs are not quadratic
    assert pairs.count() < N_DOCS


def test_winnow_finds_planted_copies_at_volume(spark, corpus):
    pairs = winnow_duplicate_pairs(
        corpus, "text", "doc_id", max_df=8, min_shared=3
    )
    planted_found = pairs.where(
        (F.col("b_id") - F.col("a_id")) == N_DOCS
    ).count()
    # exact copies share ALL fingerprints; only stop-fp-capped docs can
    # drop out, so the overwhelming majority must be found
    assert planted_found >= N_PLANTED * 0.9


N_VECS = 10_000


def test_embedding_neardup_at_volume(spark):
    """10k synthetic unit-ish vectors + 10k perturbed copies: the banded
    join finds every planted pair without quadratic candidates."""
    dims = F.sequence(F.lit(1), F.lit(64))
    base = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            dims,
            lambda d: (
                F.pmod(F.xxhash64(F.col("id") * F.lit(977) + d), F.lit(2000))
                - F.lit(1000)
            ).cast("double")
            / F.lit(1000.0),
        ).alias("embedding"),
    )
    perturbed = base.select(
        (F.col("vec_id") + N_VECS).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) * F.lit(0.5)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    both = base.unionAll(perturbed).repartition(32)
    out = cosine_neardup_pairs(both, threshold=0.9, num_planes=12, num_bands=8)
    planted = out.where((F.col("b_id") - F.col("a_id")) == N_VECS).count()
    # sign-LSH recall at cosine>=0.98 with 12x8 banding is >=99%
    assert planted >= N_VECS * 0.98
    # precision is exact (threshold verify), so no quadratic output
    assert out.count() < N_VECS * 4


def test_simhash_hamming_pairs_at_volume(spark, corpus):
    """Exact copies sit at Hamming 0; the 4-band pigeonhole join must
    recover every planted pair at volume, and 62-bit signatures keep
    random-pair noise out (expected random distance ~31)."""
    from yandex_tracker_exporter_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    out = simhash_hamming_pairs(corpus, "text", "doc_id")
    planted = out.where(
        ((F.col("b_id") - F.col("a_id")) == N_DOCS) & (F.col("hamming") == 0)
    ).count()
    assert planted == N_PLANTED
    # no quadratic noise: output stays within a small multiple of planted
    assert out.count() < N_PLANTED * 10


def test_kmeans_and_semdedup_at_volume(spark):
    """Clustering family at 10k+10k vectors with a realistic k: the
    cluster-confined prune must drop (almost) every perturbed copy and
    never blow up into an all-pairs product."""
    from yandex_tracker_exporter_spark.operators.clustering import (
        kmeans_quantized,
        semdedup_prune,
    )

    dims = F.sequence(F.lit(1), F.lit(64))
    base = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            dims,
            lambda d: (
                F.pmod(F.xxhash64(F.col("id") * F.lit(977) + d), F.lit(2000))
                - F.lit(1000)
            ).cast("double")
            / F.lit(1000.0),
        ).alias("embedding"),
    )
    perturbed = base.select(
        (F.col("vec_id") + N_VECS).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) * F.lit(0.5)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    both = base.unionAll(perturbed).repartition(32)

    asg = kmeans_quantized(both, k=16, iters=2)
    assert asg.count() == 2 * N_VECS
    assert asg.select("cluster").distinct().count() <= 16

    out = semdedup_prune(both, k=16, iters=2, threshold=0.9)
    assert out.count() == 2 * N_VECS
    dropped = out.where(~F.col("is_kept")).count()
    # a perturbed copy survives only if clustering split it from its
    # source (quantized codes differ in dim 1); allow a small tail
    assert dropped >= N_VECS * 0.9


def test_duplicated_window_ratio_at_volume(spark, corpus):
    """Sub-document window dedup at 30k docs: every planted verbatim
    copy must report all windows duplicated, and output stays one row
    per document (no hash-join fan-out)."""
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        duplicated_window_ratio,
    )

    out = duplicated_window_ratio(corpus, "text", "doc_id", window_tokens=16)
    assert out.count() == N_DOCS + N_PLANTED
    fully_dup = out.where(
        (F.col("doc_id") >= N_DOCS) & (F.col("dup_ratio") == 1.0)
    ).count()
    assert fully_dup == N_PLANTED
