"""Eval-set decontamination — a first-class training-data-pipeline step.

Before training, any document sharing verbatim n-gram content with an
evaluation/benchmark set must be dropped (test-set leakage inflates
benchmark scores). The standard industrial recipe is k-gram overlap:
a corpus document is contaminated iff it shares at least one character
k-gram with any benchmark document.

Spark-first shape:

- both sides reuse the dedup module's rolling shingle-hash kernel
  (``_shingle_hset_kernel`` — Arrow-vectorized, one codepoint pass per
  document, distinct 31-bit polynomial hashes);
- the benchmark side explodes to a DISTINCT hash relation. Benchmarks
  are small by construction (thousands of documents), so this relation
  broadcasts and the corpus is NEVER shuffled: explode + broadcast
  LEFT SEMI to find contaminated ids, broadcast LEFT ANTI to emit
  survivors — the whole pipeline is map-side against the corpus;
- hash collisions (~|shingles|²/2³¹ per doc pair) can only FALSE-POSITIVE
  a clean document into the dropped set — the safe direction for
  decontamination — and are deterministic and mirrored exactly by the
  DuckDB oracle (same polynomial hash both sides).

At 100 TB: corpus-side cost is one Arrow kernel pass + a broadcast hash
probe per shingle — linear, no shuffle. If the benchmark set were ever
too big to broadcast, the same plan degrades to a shuffled semi-join on
the hash — still linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_hset_kernel
from .partitioning import ensure_parallelism


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 9,
) -> DataFrame:
    """Corpus ids sharing at least one character ``shingle_k``-gram
    (by polynomial hash) with any benchmark document."""
    kernel = _shingle_hset_kernel(shingle_k)
    bench_hashes = (
        benchmark.select(kernel(F.col(text_col)).alias("_h"))
        .select(F.explode("_h").alias("h"))
        .distinct()
    )
    corpus_hashes = ensure_parallelism(corpus).select(
        F.col(id_col), F.explode(kernel(F.col(text_col))).alias("h")
    )
    return (
        corpus_hashes.join(F.broadcast(bench_hashes), "h", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 9,
) -> DataFrame:
    """Corpus rows that share NO ``shingle_k``-gram with the benchmark
    set (all columns preserved)."""
    bad = contaminated_ids(corpus, benchmark, text_col, id_col, shingle_k)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
