"""Operators (SURVEY §2.4/§2.7 + the 100 TB-scale data-pipeline set).

- ``sessionize``     — status cycle-time sessionization (A1) + generic
                       event sessionization (lag-based interval rebuild)
- ``dedup``          — latest-version dedup (O1), exact dedup, MinHash
                       LSH, SimHash, n-gram Jaccard, embedding near-dup
- ``watermark``      — incremental watermark computation (A2/F5)
- ``similarity``     — cosine top-k ANN (brute-force + LSH-bucketed)
- ``text_analysis``  — language-ID, quality scoring, token counting,
                       document fingerprinting
"""

from yandex_tracker_exporter_spark.operators.sessionize import (
    sessionize_events,
    status_metrics,
)
from yandex_tracker_exporter_spark.operators.dedup import (
    latest_version_dedup,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_duplicates,
    simhash,
    ngram_jaccard_pairs,
    dedup_skew_report,
)
from yandex_tracker_exporter_spark.operators.watermark import (
    compute_watermark,
    is_up_to_date,
)
from yandex_tracker_exporter_spark.operators.asof import asof_join
from yandex_tracker_exporter_spark.operators.rangejoin import interval_join
from yandex_tracker_exporter_spark.operators.skew import salted_join
from yandex_tracker_exporter_spark.operators.similarity import (
    cosine_topk,
    lsh_bucket_topk,
    cosine_neardup_pairs,
)
from yandex_tracker_exporter_spark.operators.text_analysis import (
    detect_language,
    quality_score,
    token_counts,
    fingerprint,
)

__all__ = [
    "sessionize_events",
    "status_metrics",
    "latest_version_dedup",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_duplicates",
    "simhash",
    "ngram_jaccard_pairs",
    "dedup_skew_report",
    "compute_watermark",
    "is_up_to_date",
    "asof_join",
    "interval_join",
    "salted_join",
    "cosine_topk",
    "lsh_bucket_topk",
    "cosine_neardup_pairs",
    "detect_language",
    "quality_score",
    "token_counts",
    "fingerprint",
]
