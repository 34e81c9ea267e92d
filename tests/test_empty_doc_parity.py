"""Latent-input parity: the round-7 review found that ``_tokens``'s
zero-token semantics for empty/whitespace-only text (an r6 engine fix)
had never been propagated to the oracles, which still counted one
phantom ``''`` token — invisible on the pinned fixtures (no empty
docs), broken on any real corpus that has one. The oracles now guard
the split; this test runs every affected query/oracle PAIR over a
synthetic corpus that contains an empty doc, a whitespace-only doc,
and normal docs, through the exact driver protocol (column names +
sorted stringified values).

quality_score additionally pins the 0-token contract: ratio features
are NULL (undefined), never Infinity/NaN — the only value both engines
can represent identically.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

#: the _tokens-backed contract queries that read only `documents`
AFFECTED = [
    "token_count",
    "language_id",
    "quality_score",
    "corpus_clean",
    "length_buckets",
    "repetition_signals",
    "source_gini",
    "pack_token_budget",
    "bigram_lm",
    "split_leakage",
    "term_pmi",
    "lm_doc_score",
    "mixture_apportion",
    "pareto_frontier",
    "chunk_documents",
    "dup_window_ratio",
    "tfidf_top_terms",
    "bm25_rank",
]

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs on", "en", "web"),
    (1, "", "en", "web"),  # EMPTY: zero tokens, not one phantom ''
    (2, "   \t  ", "en", "books"),  # whitespace-only: also zero tokens
    (3, "a b c d e f g h i j k l m n o p q r s t", "en", "books"),
    (4, "data pipelines shuffle partitions and broadcast small tables", "en", "web"),
    (5, "the and of is in to a the and of", "en", "wiki"),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("emptydoc"))
    table = pa.table(
        {
            "doc_id": pa.array([i for (i, t, lg, s) in DOCS], pa.int64()),
            "text": pa.array([t for (i, t, lg, s) in DOCS], pa.string()),
            "lang": pa.array([lg for (i, t, lg, s) in DOCS], pa.string()),
            "source": pa.array([s for (i, t, lg, s) in DOCS], pa.string()),
            "n_chars": pa.array(
                [len(t) for (i, t, lg, s) in DOCS], pa.int64()
            ),
        }
    )
    # a single parquet FILE, the harness layout (a Spark .parquet
    # directory would not match DuckDB's read_parquet path)
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


def _norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted([tuple(str(r[i]) for i in idx) for r in rows])


@pytest.mark.parametrize("name", AFFECTED)
def test_affected_pair_agrees_on_empty_docs(spark, corpus_dir, name):
    sdf = entry.queries()[name](spark, corpus_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{corpus_dir}/documents.parquet')"
        )
        res = con.execute(entry.oracle_sql()[name])
        drows = res.fetchall()
        dcols = [d[0] for d in res.description]
    finally:
        con.close()
    assert [c.lower() for c in dcols] == [c.lower() for c in sdf.columns]
    assert _norm(srows, sdf.columns) == _norm(drows, dcols), name


def test_quality_score_zero_token_features_are_null(spark, corpus_dir):
    got = {
        r["doc_id"]: r
        for r in entry.queries()["quality_score"](spark, corpus_dir).collect()
    }
    # doc 1 is truly empty: zero tokens, UNDEFINED ratio features (null,
    # never Infinity/NaN — the only cross-engine-representable value)
    r = got[1]
    assert r["n_tokens"] == 0
    assert r["avg_token_len"] is None and r["stopword_ratio"] is None
    assert r["quality"] is None
    # doc 2 contains a TAB: Spark and DuckDB `trim` strip SPACES only,
    # so it does NOT trim to '' — both engines consistently see two
    # phantom '' tokens from the Java-split semantics (the pair test
    # above pins the cross-engine agreement; this pins the edge shape)
    assert got[2]["n_tokens"] == 2
    # normal docs keep finite features
    assert all(
        math.isfinite(got[d]["quality"]) for d in (0, 3, 4, 5)
    )
