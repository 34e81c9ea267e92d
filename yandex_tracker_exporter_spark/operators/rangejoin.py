"""Bucketized range (interval) join — the second classic operator Spark
has no native physical strategy for (Catalyst plans a point-in-interval
join as BroadcastNestedLoop / cartesian + filter, which dies at scale).

``interval_join(points, intervals)`` matches each point to every
interval containing it (``start <= p < end``) WITHOUT an equi key:

1. choose a bucket width; a point belongs to one bucket
   (``floor(t / width)``), an interval covers a contiguous bucket range
   (exploded via ``sequence`` — cheap when width ≳ typical interval
   length);
2. equi-join on the bucket id (hash shuffle, AQE-splittable);
3. exact containment filter.

Each (point, interval) pair meets in exactly one bucket — the point's
own — so no post-join dedup is needed. Cost is |P| + Σ⌈len/width⌉
shuffle rows instead of |P|×|I|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join points to containing intervals (``start <= point < end``).

    Only ``how='inner'`` is supported: the containment predicate is
    applied AFTER the bucket equi-join, so an outer join's
    null-extended rows would always fail it and the result would
    silently degenerate to inner semantics (and bucket explosion would
    duplicate unmatched intervals) — rejected loudly instead. For
    "points with no containing interval", anti-join the points against
    this result on the point key."""
    if how != "inner":
        raise ValueError(
            "interval_join supports how='inner' only; outer variants "
            f"would silently drop null-extended rows (got {how!r})"
        )
    width = F.lit(bucket_width_s)
    p = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / width)
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / width),
                F.floor(F.unix_timestamp(F.col(end_ts)) / width),
            )
        ),
    )
    joined = p.join(i, "_bucket", how).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_bucket")
