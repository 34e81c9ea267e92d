"""End-to-end training-data corpus pipeline (the beyond-reference
operator set in one run): quality gate → language ID → PII scrub →
eval-set decontamination → context-window chunking → exact / simhash /
window-level dedup → MinHash-LSH near-dup pairs → duplicate-cluster
collapse → token-budget packing → embedding near-dup pairs → SemDeDup
(k-means + within-cluster prune).

Run: ``python examples/corpus_pipeline.py [sf_dir]`` (default
``/root/testdata/sf0.001``). Every stage is a lazy DataFrame transform;
the ``collect``s at the end materialize summary counts only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark import get_spark
from yandex_tracker_exporter_spark.operators.decontaminate import decontaminate
from yandex_tracker_exporter_spark.operators.clustering import semdedup_prune
from yandex_tracker_exporter_spark.operators.dedup import (
    canonical_representatives,
    exact_dedup,
    minhash_lsh_duplicates,
    simhash_hamming_pairs,
)
from yandex_tracker_exporter_spark.operators.text_analysis import (
    duplicated_window_ratio,
)
from yandex_tracker_exporter_spark.operators.similarity import cosine_neardup_pairs
from yandex_tracker_exporter_spark.operators.text_analysis import (
    chunk_tokens,
    detect_language,
    pack_token_budget,
    quality_score,
    redact_pii,
    repetition_signals,
    stratified_sample,
    tfidf_top_terms,
)
from yandex_tracker_exporter_spark.sources.tables import load_table


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="corpus-pipeline", master="local[4]")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. quality + repetition gates (token/stopword heuristics and the
    # Gopher top-bigram filter) — both map-only signal passes over the
    # raw corpus, combined into ONE keep-set so downstream plans see a
    # single semi-join, not a cascade
    scored = quality_score(docs, "text", "doc_id")
    rep = repetition_signals(docs, "text", "doc_id")
    kept_ids = (
        scored.where((F.col("n_tokens") >= 16) & (F.col("stopword_ratio") <= 0.5))
        .select("doc_id")
        .join(
            rep.where(F.col("top_bigram_ratio") <= 0.5).select("doc_id"),
            "doc_id",
        )
    )
    kept = docs.join(kept_ids, "doc_id")

    # 2. language ID + PII scrub — map-only
    langs = detect_language(kept, "text", "doc_id")
    clean = redact_pii(kept, "text", "doc_id").select(
        "doc_id", F.col("redacted").alias("text")
    )

    # 2b. eval-set decontamination: every 20th doc stands in for a
    # held-out benchmark; survivors share no 20-gram with it
    benchmark = clean.where(F.col("doc_id") % 20 == 0)
    train_pool = clean.where(F.col("doc_id") % 20 != 0)
    # persist: five downstream consumers (chunks, exact/near dedup,
    # cluster collapse, packing) re-drive this plan independently
    decontaminated = decontaminate(train_pool, benchmark, shingle_k=20).persist()

    # 3. context-window chunks — map-only explode
    chunks = chunk_tokens(decontaminated, "text", "doc_id", chunk_size=32, overlap=8)

    # 4. dedup: exact (hash-groupBy) + near-dup (LSH banding, no cross join).
    # The synthetic embeddings have no natural near-dups, so model a
    # partially re-encoded corpus (perturbed copies) like the driver
    # query does — the LSH banding then has something to find.
    # (pairs are found on the decontaminated pool so cluster minima are
    # guaranteed to exist in the corpus being collapsed)
    exact = exact_dedup(decontaminated, "text", "doc_id")
    near = minhash_lsh_duplicates(decontaminated, "text", "doc_id", threshold=0.5)
    sim_pairs = simhash_hamming_pairs(decontaminated, "text", "doc_id")
    win_dup = duplicated_window_ratio(decontaminated, "text", "doc_id")
    reencoded = emb.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1).cast("double") * F.lit(0.5)),
            F.transform(F.slice("embedding", 2, 63), lambda x: x.cast("double")),
        ).alias("embedding"),
    )
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    emb_near = cosine_neardup_pairs(
        base.unionAll(reencoded), threshold=0.9, num_planes=8, num_bands=4
    )
    # SemDeDup on the same planted corpus: cluster, then prune semantic
    # duplicates inside each cluster (pairwise work stays cluster-local)
    sem = semdedup_prune(base.unionAll(reencoded), k=8, iters=2, threshold=0.9)

    # 5. collapse near-dup clusters to their canonical representative,
    # then rebalance the language mixture (deterministic hash-based
    # up/downsampling) and pack into fixed token-budget training bins
    # persist: the collapse sits on an iterative clustering plan and the
    # summary below drives several independent actions over it
    deduped = canonical_representatives(decontaminated, near).persist()
    with_lang = deduped.join(docs.select("doc_id", "lang"), "doc_id")
    mixed = stratified_sample(
        with_lang, "lang", {"zh": 0.5, "de": 2.0}, default_rate=1.0
    )
    # copies need unique ids for deterministic packing order
    mixed_ids = mixed.select(
        (F.col("doc_id") * 10 + F.col("copy_idx")).alias("doc_id"), "text"
    )
    packed = pack_token_budget(mixed_ids, "text", "doc_id", budget=512, num_shards=8)

    print("docs:", docs.count(), "→ kept after quality gate:", kept.count(),
          "→ decontaminated:", decontaminated.count())
    print("language histogram:",
          sorted((r.detected_lang, r.cnt) for r in
                 langs.groupBy("detected_lang").agg(F.count("*").alias("cnt")).collect()))
    print("chunks:", chunks.count())
    print("distinct contents:", exact.count(),
          "| text near-dup pairs:", near.count(),
          "| simhash pairs (hamming<=3):", sim_pairs.count(),
          "| docs with duplicated 16-token windows:",
          win_dup.where(F.col("n_dup_windows") > 0).count(),
          "| embedding near-dup pairs:", emb_near.count(),
          "| semdedup drops:", sem.where(~F.col("is_kept")).count())
    print("after cluster collapse:", deduped.count(),
          "→ after mixture resampling:", mixed.count(),
          "docs in", packed.agg(F.count_distinct("shard", "bin_idx")).collect()[0][0],
          "training bins")
    top_terms = (
        tfidf_top_terms(deduped, "text", "doc_id", top_k=1)
        .groupBy("term").agg(F.count("*").alias("docs_led"))
        .orderBy(F.col("docs_led").desc(), "term").limit(5)
    )
    print("most-distinctive corpus terms:",
          [(r.term, r.docs_led) for r in top_terms.collect()])

    # 6. release hygiene: split the surviving corpus, audit sub-document
    # leakage across the splits, score quality with the corpus-trained
    # bigram LM, and CDC-chunk for the sub-file dedup store
    from yandex_tracker_exporter_spark.operators.dedup import cdc_chunks
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        lm_doc_score,
        split_leakage_audit,
    )

    kept_docs = docs.join(deduped.select("doc_id"), "doc_id", "leftsemi")
    leaks = split_leakage_audit(kept_docs)
    lm_scores = lm_doc_score(kept_docs)
    chunks_cdc = cdc_chunks(kept_docs)
    print("cross-split leaked windows:",
          sorted((r.split_a, r.split_b, r.n_window_keys) for r in leaks.collect()))
    print("LM quality: lowest-scoring doc ids:",
          [r.doc_id for r in
           lm_scores.orderBy("mean_p_milli", "doc_id").limit(3).collect()])
    print("CDC chunks:", chunks_cdc.count(),
          "(~64-char content-defined, shift-tolerant dedup keys)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
