"""r13 (VERDICT r12 #3): the corpus-sized barrier defaults flipped to
the scale-safe STREAMING shape (re-tokenize instead of an
executor-memory localCheckpoint persist); bench-scale entry queries opt
back in explicitly. These pins prove each flag is a pure plan change —
identical rows either way — so flipping the default can never move a
result, and the opt-in can never drift from the streaming truth."""

import random

from yandex_tracker_exporter_spark.operators.text_analysis import (
    duplicated_window_ratio,
    lm_doc_score,
    split_leakage_audit,
    tfidf_top_terms,
)


def _corpus(spark):
    """Docs with planted cross-doc duplicate windows (so the window/
    leakage operators produce non-trivial rows) plus junk shapes."""
    rng = random.Random(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def doc(n=40):
        return " ".join(rng.choice(words) for _ in range(n))

    rows, i = [], 0
    shared = doc(32)  # two full 16-token windows, duplicated verbatim
    for _ in range(8):
        body = doc()
        rows.append((i, body + " " + shared))
        i += 1
    rows += [(100 + j, doc()) for j in range(6)]
    rows += [(900, None), (901, ""), (902, "   "), (903, "single")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_tfidf_barrier_twin_matches_streaming(spark):
    df = _corpus(spark)
    on = _sorted_rows(tfidf_top_terms(df, materialize_doc_term=True))
    off = _sorted_rows(tfidf_top_terms(df, materialize_doc_term=False))
    assert on == off
    assert len(on) >= 10  # non-vacuous


def test_dup_window_ratio_barrier_twin_matches_streaming(spark):
    df = _corpus(spark)
    on = _sorted_rows(
        duplicated_window_ratio(df, materialize_windows=True)
    )
    off = _sorted_rows(
        duplicated_window_ratio(df, materialize_windows=False)
    )
    assert on == off
    # the planted shared windows must register as duplicated somewhere
    assert any(r[2] > 0 for r in on)


def test_split_leakage_barrier_twin_matches_streaming(spark):
    df = _corpus(spark)
    on = _sorted_rows(split_leakage_audit(df, materialize_per_split=True))
    off = _sorted_rows(split_leakage_audit(df, materialize_per_split=False))
    assert on == off


def test_lm_doc_score_barrier_twin_matches_streaming(spark):
    df = _corpus(spark)
    on = _sorted_rows(lm_doc_score(df, materialize_doc_bigrams=True))
    off = _sorted_rows(lm_doc_score(df, materialize_doc_bigrams=False))
    assert on == off
    assert len(on) >= 10  # every non-junk doc scores
