"""Input-parallelism helper for CPU-heavy operator pipelines.

A parquet file is only splittable at row-group boundaries, so a corpus
delivered as a few single-row-group files scans as a few partitions no
matter what ``spark.sql.files.*`` says — and every map-side-heavy stage
built on it (signature kernels, projection folds, shingling) runs on a
few cores while the rest of the cluster idles.

``ensure_parallelism`` re-splits ONLY when the scan's natural split count
is below the cluster's parallelism. At scale (100 TB → O(10^5) splits)
the condition is false and the DataFrame passes through untouched — no
extra shuffle. For the pair-finding self-joins the added exchange is
narrow (id + raw text) and strictly smaller than the band-key exchange
that follows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition ``df`` to the default parallelism iff its current plan
    yields fewer partitions (small/single-row-group inputs). Values are
    unaffected; this is a pure physical re-split.
    """
    sc = df.sparkSession.sparkContext
    target = max(1, int(sc.defaultParallelism * min_factor))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
