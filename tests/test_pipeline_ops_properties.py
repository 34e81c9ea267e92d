"""Replica-based invariant tests for the training-pipeline operators:
each Spark expression is checked against an independent pure-Python
replica over a broad seeded-random sample (one createDataFrame + one
collect per operator, keeping JVM round-trips off the hot path)."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.partitioning import global_row_number
from yandex_tracker_exporter_spark.operators.text_analysis import (
    SAMPLE_HASH_BASE,
    SAMPLE_HASH_PRIME,
    hash_sample,
    repetition_signals,
    stratified_sample,
    tfidf_top_terms,
)

VOCAB = ["a", "bb", "ccc", "dd", "e", "zebra", "qq"]


def _random_docs(n=60, seed=7):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(1, 40))]
        docs.append((i, " ".join(toks)))
    return docs


def _poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * SAMPLE_HASH_BASE + ord(ch)) % SAMPLE_HASH_PRIME
    return h


def test_repetition_signals_matches_python_replica(spark):
    docs = _random_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    for doc_id, text in docs:
        toks = text.split()
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_distinct_tokens == len(set(toks))
        assert r.top_token_count == max(Counter(toks).values())
        assert r.top_bigram_count == (
            max(Counter(bigrams).values()) if bigrams else 0
        )
        assert r.dup_token_ratio == pytest.approx(
            (len(toks) - len(set(toks))) / len(toks)
        )
        assert 0.0 <= r.dup_token_ratio <= 1.0
        assert 0.0 <= r.top_bigram_ratio <= 1.0


def test_hash_sample_bucket_matches_python_replica(spark):
    docs = _random_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r.sample_bucket for r in hash_sample(
        df, buckets=100, keep=100, salt="prop:"
    ).collect()}
    # keep=buckets keeps every row, exposing every bucket value
    assert len(out) == len(docs)
    for doc_id, _ in docs:
        h = _poly_hash(f"{doc_id}prop:")
        assert out[doc_id] == ((h * h + h) % SAMPLE_HASH_PRIME) % 100


def test_stratified_sample_multiplicity_is_floor_or_ceil(spark):
    docs = [(i, "x", ["g0", "g1", "g2"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rates = {"g0": 0.4, "g1": 1.7, "g2": 3.0}
    out = stratified_sample(df, "lang", rates, key_col="doc_id")
    copies = Counter((r.doc_id for r in out.collect()))
    for doc_id, _, lang in docs:
        r = rates[lang]
        lo, hi = int(r), int(r) + (1 if r != int(r) else 0)
        assert lo <= copies.get(doc_id, 0) <= hi, (doc_id, lang)
    # copy_idx must be dense 0..n-1 per row
    idx = {}
    for row in out.collect():
        idx.setdefault(row.doc_id, []).append(row.copy_idx)
    for doc_id, lst in idx.items():
        assert sorted(lst) == list(range(len(lst)))


def test_tfidf_matches_python_replica(spark):
    docs = _random_docs(n=30, seed=11)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df)
        for r in tfidf_top_terms(df, top_k=3).collect()
    }
    dfreq = Counter()
    per_doc = {}
    for doc_id, text in docs:
        c = Counter(text.split())
        per_doc[doc_id] = c
        dfreq.update(c.keys())
    for doc_id, c in per_doc.items():
        ranked = sorted(
            c.items(), key=lambda kv: (-kv[1], dfreq[kv[0]], kv[0])
        )[:3]
        for rank, (term, tf) in enumerate(ranked, start=1):
            assert got[(doc_id, rank)] == (term, tf, dfreq[term])


def test_global_row_number_matches_sorted_enumerate(spark):
    rng = random.Random(3)
    rows = [(i, rng.randint(0, 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    for width in (1, 7, 64, 10_000):
        got = {
            r.doc_id: r.global_rank
            for r in global_row_number(
                df,
                [F.col("v").asc(), F.col("doc_id").asc()],
                F.floor(F.col("v") / F.lit(width)),
            ).collect()
        }
        want = {
            doc_id: i
            for i, (doc_id, _) in enumerate(
                sorted(rows, key=lambda t: (t[1], t[0])), start=1
            )
        }
        assert got == want, f"bucket width {width}"


def test_duplicated_window_ratio_matches_python_replica(spark):
    import math
    from collections import defaultdict

    from yandex_tracker_exporter_spark.operators.text_analysis import (
        duplicated_window_ratio,
    )

    docs = _random_docs(n=80, seed=11)
    docs += [(1000 + i, docs[i][1]) for i in range(10)]  # verbatim copies
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ratio)
        for r in duplicated_window_ratio(df, window_tokens=16).collect()
    }
    win_docs = defaultdict(set)
    windows = {}
    for doc_id, text in docs:
        toks = text.split()
        n_w = max(1, math.ceil(len(toks) / 16))
        wlist = [" ".join(toks[i * 16:(i + 1) * 16]) for i in range(n_w)]
        windows[doc_id] = wlist
        for w in wlist:
            win_docs[w].add(doc_id)
    for doc_id, wlist in windows.items():
        ndup = sum(1 for w in wlist if len(win_docs[w]) >= 2)
        assert got[doc_id] == (len(wlist), ndup, ndup / len(wlist)), doc_id
    # every window of a verbatim copy is duplicated by construction
    for i in range(10):
        n_w, ndup, ratio = got[1000 + i]
        assert ndup == n_w and ratio == 1.0


def test_audio_frame_energy_matches_python_replica(spark):
    from collections import defaultdict

    from yandex_tracker_exporter_spark.multimodal import (
        audio_frame_energy,
        encode_wav,
    )

    rng = random.Random(3)
    rows, expected = [], {}
    for i in range(20):
        n = rng.randint(0, 700)
        samples = [rng.randint(-32768, 32767) for _ in range(n)]
        rows.append((i, bytearray(encode_wav(samples))))
        frames = [samples[f * 256:(f + 1) * 256] for f in range((n + 255) // 256)]
        expected[i] = [
            (fi, len(fr), sum(x * x for x in fr)) for fi, fr in enumerate(frames)
        ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = defaultdict(list)
    for r in audio_frame_energy(df, frame_size=256).collect():
        got[r.media_id].append((r.frame_idx, r.n_samples, r.energy))
    for i, exp in expected.items():
        assert sorted(got[i]) == exp, i


def test_global_row_number_null_key_matches_bare_window(spark):
    """Latent-input pin (round-9 probe): a NULL leading sort key forms
    a NULL bucket that sorts FIRST in the prefix sum — so its rows take
    the lowest global ranks and shift every real row up by the null
    count. That is EXACTLY the bare `row_number() OVER (ORDER BY k)`
    semantics (Spark asc = nulls first), i.e. the distributed two-pass
    scheme stays equivalent to the single-window spec on dirty input
    (junk participates in a global ranking the way SQL says it does —
    this is the documented contract, not a corruption)."""
    from pyspark.sql import Window

    rows = [(10, 1), (20, 2), (30, 3), (None, 9), (None, 8)]
    df = spark.createDataFrame(rows, "k long, id long")
    got = {
        r["id"]: r["global_rank"]
        for r in global_row_number(
            df,
            [F.col("k").asc(), F.col("id").asc()],
            F.floor(F.col("k") / F.lit(20)),
        ).collect()
    }
    w = Window.orderBy(F.col("k").asc(), F.col("id").asc())
    want = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want
