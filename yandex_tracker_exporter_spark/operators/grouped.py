"""Grouped custom aggregation via ``applyInPandas``.

Completes the custom-operator surface triad: ``mapInPandas``
(multimodal), ``applyInPandasWithState`` (incremental sessions), and —
here — grouped-batch pandas aggregation for semantics awkward in SQL
aggregates. The demonstrator is the exact per-entity **median
inter-event gap**: order statistics need the whole group (the classic
applyInPandas use case), and the result is deterministic so a DuckDB
``median()`` oracle can verify it.

Scale notes: one shuffle on the entity key; each group materializes as
one Arrow batch, so per-entity cardinality must be memory-bounded
(true for tracker-style entities; for unbounded groups use an approx
percentile instead — Spark's ``percentile_approx`` is listed alongside
for exactly that reason).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .funnel import MEASURABLE_MAX  # noqa: E402 — shared junk-magnitude rail

MEDIAN_GAP_SCHEMA = StructType(
    [
        StructField("entity", LongType()),
        StructField("n_gaps", LongType()),
        StructField("median_gap_s", DoubleType()),
    ]
)


def exact_median_gap(
    events: DataFrame, entity_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Exact median of per-entity inter-event gaps (seconds).

    Gaps are computed on epoch seconds (floor) so results are precision
    -portable; entities with fewer than 2 events are omitted.
    """
    prepped = events.select(
        F.col(entity_col).cast("long").alias("entity"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("epoch_s"),
    )

    def median_of_gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        # dropna: a null ts arrives as NaN, sorts LAST, and forms one
        # NaN trailing gap — pd.median skips it but len() counted it,
        # inflating n_gaps and diverging from the native twin (whose
        # lag()-minus-null gap is null-dropped). An event with no
        # timestamp has no gap to any neighbor.
        ordered = pdf["epoch_s"].dropna().sort_values().to_numpy()
        if len(ordered) < 2:
            return pd.DataFrame(columns=["entity", "n_gaps", "median_gap_s"])
        gaps = ordered[1:] - ordered[:-1]
        return pd.DataFrame(
            {
                "entity": [pdf["entity"].iloc[0]],
                "n_gaps": [len(gaps)],
                "median_gap_s": [float(pd.Series(gaps).median())],
            }
        )

    return prepped.groupBy("entity").applyInPandas(median_of_gaps, MEDIAN_GAP_SCHEMA)


def median_gap_native(
    events: DataFrame, entity_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Pure-JVM formulation of :func:`exact_median_gap`: ``lag`` window
    for the gaps + the built-in exact ``median`` aggregate (Spark ≥ 3.4).

    Row-for-row equal to the pandas path (tested), with no Python/Arrow
    in the plan — this is the variant production pipelines should use;
    ``exact_median_gap`` stays as the documented grouped-custom-agg
    surface for order statistics Spark has no builtin for. Same single
    shuffle on the entity key (the window and the aggregation share it).
    """
    prepped = events.select(
        F.col(entity_col).cast("long").alias("entity"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("epoch_s"),
    )
    w = Window.partitionBy("entity").orderBy(F.col("epoch_s").asc())
    gaps = prepped.withColumn(
        "gap", F.col("epoch_s") - F.lag("epoch_s").over(w)
    ).where(F.col("gap").isNotNull())
    return gaps.groupBy("entity").agg(
        F.count("gap").alias("n_gaps"),
        F.median("gap").alias("median_gap_s"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    num_buckets: int = 1000,
) -> DataFrame:
    """Histogram-sketch quantiles — the 100 TB path for percentiles.

    Exact per-group percentiles (``value_percentiles``) materialize
    every group's values for a sort: fine for bounded entities, a
    non-starter for unbounded groups. This operator keeps FIXED state —
    ``num_buckets`` counters per group — like production quantile
    sketches, but with deterministic equal-width bucketing over the
    caller-supplied ``[lo, hi]`` domain so any engine reproduces it
    bit-for-bit (t-digest/KLL sketches are implementation-defined; an
    equal-width histogram is arithmetic).

    Estimate = the LOWER EDGE of the first bucket whose cumulative
    count reaches ``ceil(q * total)`` — error bounded by one bucket
    width. Scale shape: ONE partial-aggregable shuffle on
    (group, bucket); the quantile selection then runs on the tiny
    (groups × buckets) relation (a per-group window + conditional
    min-aggregates).

    ``lo``/``hi`` come from the caller (a prior cheap min/max agg or
    domain knowledge); values outside clamp into the edge buckets.

    Output: group, n, then one ``p<q>`` column per requested quantile.
    """
    if not lo < hi:
        # NaN bounds fail this check too (NaN compares false): Spark's
        # max() treats NaN as GREATEST, so an unfiltered min/max over a
        # corpus with one NaN measurement hands hi=NaN here. Loud and
        # actionable beats a bare "need lo < hi".
        raise ValueError(
            f"need lo < hi (got lo={lo!r}, hi={hi!r}); a NaN bound "
            "means the min/max that derived the domain was not "
            "NaN-filtered — exclude isnan(value) rows first"
        )
    width = (hi - lo) / num_buckets
    v = F.col(value_col).cast("double")
    bucket = F.least(
        F.lit(num_buckets - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width))),
    ).cast("long")
    counts = (
        # null/NaN values carry no rank information and would otherwise
        # land in a bogus bucket that skews every cumulative count
        df.where(v.isNotNull() & ~F.isnan(v) & (F.abs(v) < F.lit(MEASURABLE_MAX)))
        .select(F.col(group_col), bucket.alias("_hq_bucket"))
        .groupBy(group_col, "_hq_bucket")
        .agg(F.count(F.lit(1)).alias("_hq_n"))
    )
    w_grp = Window.partitionBy(group_col)
    w_cum = w_grp.orderBy(F.col("_hq_bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        F.col(group_col),
        "_hq_bucket",
        F.sum("_hq_n").over(w_cum).alias("_hq_cum"),
        F.sum("_hq_n").over(w_grp).alias("_hq_total"),
    )
    aggs = [F.max("_hq_total").cast("long").alias("n")]
    for q in quantiles:
        hit = F.when(
            F.col("_hq_cum") >= F.ceil(F.lit(q) * F.col("_hq_total")),
            F.col("_hq_bucket"),
        )
        est = F.lit(lo) + F.min(hit) * F.lit(width)
        # label from the decimal string, not int(q*100): 0.999 must be
        # p99_9 (not a duplicate p99) and 0.29 must be p29 (int() of
        # 28.999999999999996 truncates to p28)
        label = f"{q * 100:.10g}".replace(".", "_").replace("-", "m")
        aggs.append(est.alias(f"p{label}"))
    return cum.groupBy(group_col).agg(*aggs)


def ohlc_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Hourly open/high/low/close bars over a value stream.

    Open/close are the first/last values under the total (ts, id)
    order inside each hour — resolved with two row_number windows over
    the SAME hour partitioning (one shuffle; the second window reuses
    the sort's partitioning, Catalyst plans a single Exchange). The
    rollup then collapses each hour to one row. Values pass through
    untouched (no float arithmetic), so any engine agrees bit-for-bit;
    the hour key is emitted as a floored epoch, never a raw timestamp.

    Scales with the hour-key cardinality like any time-bucketed
    aggregate: partitions are hours, map-side combine collapses each
    split before the exchange.
    """
    hour_epoch = F.floor(F.unix_timestamp(F.date_trunc("hour", F.col(ts_col)))).cast(
        "long"
    )
    v = F.col(value_col).cast("double")
    base = (
        # A bar summarizes real measurements: a NaN value would poison
        # the hour's high (NaN is greatest in Spark's double order) and
        # close; a null value as the hour's last event nulled close; a
        # null ts would form a phantom NULL-hour bar. None of them is a
        # measurement — drop before any window (funnel _measurable
        # posture), so n_events counts only real measurements.
        events.where(
            F.col(ts_col).isNotNull()
            & v.isNotNull()
            & ~F.isnan(v)
            & (F.abs(v) < F.lit(MEASURABLE_MAX))
        )
        .select(
            hour_epoch.alias("hour_epoch"),
            F.col(value_col).alias("_v"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
        )
    )
    w_asc = Window.partitionBy("hour_epoch").orderBy("_ts", "_id")
    w_desc = Window.partitionBy("hour_epoch").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    ranked = base.select(
        "hour_epoch",
        "_v",
        F.row_number().over(w_asc).alias("_rn_a"),
        F.row_number().over(w_desc).alias("_rn_d"),
    )
    return ranked.groupBy("hour_epoch").agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col("_v"))).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max(F.when(F.col("_rn_d") == 1, F.col("_v"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def zscore_outliers(
    events: DataFrame,
    segment_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    sigmas: int = 2,
) -> DataFrame:
    """Per-segment z-score outliers in EXACT integer arithmetic.

    Values are fixed-pointed to cents (floor(v·100)); each segment's
    count n, sum S, and sum-of-squares Q are exact int64 moments (the
    ``regression_stats`` lesson: int64 moments, not decimals). The
    2σ test is then algebra with no division at all::

        |x − S/n| > kσ  ⇔  n·(n·x − S)² > k²·n·(n·Q − S²) / n
                        ⇔  (n·x − S)² > k²·(n·Q − S²)

    so the outlier predicate — and the reported deviation, a floor-div
    milli-z numerator — is bit-identical in any engine, with no float
    comparison at the boundary. Plan: one groupBy shuffle for the
    moments (driver-small result, broadcast back) + a map-side filter
    over the stream. Int64 headroom: n·x ≈ 2e9 at SF100, squared 4e18
    < 2^63 — noted at the operator boundary.
    """
    # The exact-decimal predicate below squares `sigmas` into a
    # decimal(19,0): a fractional sigmas (2.5 → 6.25) would be SILENTLY
    # rounded to 6, quietly widening the threshold where the old float
    # multiply was exact. Integer-only is the operator's contract
    # (exact integer arithmetic is the whole point) — fail loudly.
    if not isinstance(sigmas, int) or isinstance(sigmas, bool):
        raise TypeError(
            f"sigmas must be an int (exact-integer predicate); got "
            f"{sigmas!r} ({type(sigmas).__name__}). For fractional "
            "thresholds scale the comparison yourself, e.g. compare "
            "100*dev^2 against (10*sigmas)^2*var."
        )
    cents = F.floor(F.col(value_col) * 100).cast("long")
    raw = F.col(value_col).cast("double")
    base = (
        # A null/NaN value yields null cents: count(1) counted the row
        # into n while sum() skipped it in S and Q, so ONE junk row
        # shifted dev = n·x − S (and the var term) for EVERY real row
        # in the segment — the moments must be over exactly the rows
        # the predicate tests (funnel _measurable posture).
        events.where(
            raw.isNotNull() & ~F.isnan(raw) & (F.abs(raw) < F.lit(MEASURABLE_MAX))
        )
        .select(
            F.col(segment_col).alias("segment"),
            F.col(id_col).alias("event_id"),
            cents.alias("cents"),
        )
    )
    moments = base.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_seg"),
        F.sum("cents").alias("s_seg"),
        F.sum(F.col("cents") * F.col("cents")).alias("q_seg"),
    )
    joined = base.join(F.broadcast(moments), "segment")
    dev = F.col("n_seg") * F.col("cents") - F.col("s_seg")  # n·x − S
    # The PREDICATE's products run in decimal(38,0), not int64: the
    # factor-100 scale check caught n·Q at ~4e20 > 2^63 (ANSI
    # ARITHMETIC_OVERFLOW killed the query — the old headroom comment
    # assumed SF-scaled n·x but per-SEGMENT n grows with the corpus).
    # Decimal(19)×decimal(19) products are exact to 38 digits, which
    # holds to n ≈ 1e15 rows/segment at 1e4 cents — the overflow
    # ceiling moves from "factor 100 of the harness" to "beyond 100 TB".
    # Boolean is identical wherever int64 didn't overflow (both exact),
    # so the contract is untouched; outputs (dev, dev_milli) keep their
    # original arithmetic, which fits int64 at any realistic scale.
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731 — local shorthand
    dev_dec = d19(F.col("n_seg")) * d19(F.col("cents")) - d19(F.col("s_seg"))
    var_dec = d19(F.col("n_seg")) * d19(F.col("q_seg")) - d19(
        F.col("s_seg")
    ) * d19(F.col("s_seg"))
    out = joined.where(
        dev_dec * dev_dec > F.lit(sigmas * sigmas).cast("decimal(19,0)") * var_dec
    )
    # milli-z numerator: floor(1000·(n·x − S) / n) with floored (not
    # truncated) division so negative deviations match any engine
    dev_milli = F.floor(
        (dev * 1000).cast("double") / F.col("n_seg").cast("double")
    ).cast("long")
    return out.select(
        "segment",
        F.col("event_id").cast("long"),
        "cents",
        F.col("n_seg").cast("long"),
        dev_milli.alias("dev_milli"),
    )
