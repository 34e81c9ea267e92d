"""Round-9 operator-surface review, part 4: latent-input shapes
through the grouped STATS family (operators/grouped.py). Contract
fixtures (events.value) contain no NULL/NaN at any SF — every fix is
pinned result-neutral by the manifest sweep.

Bug classes found and fixed, all "one junk measurement corrupts or
kills REAL rows":

- zscore_outliers counted a null/NaN-value row into n (count(1))
  while sum() skipped its null cents in S and Q — the moments went
  inconsistent and dev = n·x − S (and the variance term) shifted for
  EVERY real row in the segment (measured: n_seg 10→11, dev_milli
  3600000→3727272 for the surviving outlier);
- ohlc_hourly let a NaN value poison the hour's high AND close (NaN
  is GREATEST in Spark's double order), a null value as the hour's
  last event null the real close, and a null ts form a phantom
  NULL-hour bar;
- exact_median_gap's pandas kernel counted a NaT's NaN trailing gap
  into n_gaps (pd.median skips NaN but len() does not) while the
  native lag() twin null-dropped it — a divergence between two paths
  documented (and tested) row-for-row equal;
- the histogram_quantiles CALLER derived hi from an unfiltered max():
  one NaN measurement → hi=NaN → the operator's lo < hi check raised
  and killed the query (fixed in q_histogram_quantiles; the operator
  now also raises an actionable message naming the NaN-filter fix).

Fix posture = funnel `_measurable`: a null/NaN value is not a
measurement and cannot participate in any statistic; a null ts cannot
anchor a time bucket.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.grouped import (
    exact_median_gap,
    histogram_quantiles,
    median_gap_native,
    ohlc_hourly,
    zscore_outliers,
)

T = dt.datetime.fromisoformat
EV_SCHEMA = "event_type string, event_id long, ts timestamp, value double"

CLEAN = [
    ("a", i, T(f"2024-01-01 10:{i:02d}:00"), float(v))
    for i, v in enumerate([10, 11, 9, 10, 50, 10, 11, 9, 10, 10])
]
JUNK_VALUES = [
    ("a", 97, T("2024-01-01 10:30:00"), None),
    ("a", 98, T("2024-01-01 10:59:00"), float("nan")),  # hour's last event
    ("a", 99, None, 5.0),
]


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_zscore_junk_measurements_do_not_shift_moments(spark):
    clean = zscore_outliers(_ev(spark, CLEAN))
    dirty = zscore_outliers(_ev(spark, CLEAN + JUNK_VALUES[:2]))
    assert _rows(dirty) == _rows(clean) == [("a", 4, 5000, 10, 3600000)]


def test_ohlc_junk_rows_do_not_poison_bars(spark):
    clean = ohlc_hourly(_ev(spark, CLEAN))
    dirty = ohlc_hourly(_ev(spark, CLEAN + JUNK_VALUES))
    # NaN at 10:59 used to become high AND close; the null-ts row used
    # to add a phantom NULL-hour bar
    assert _rows(dirty) == _rows(clean) == [
        (1704103200, 10.0, 50.0, 9.0, 10.0, 10)
    ]


def test_median_gap_twins_agree_on_null_ts(spark):
    rows = [
        (1, "x", T("2024-01-01 10:00:00"), 0.0),
        (1, "x", T("2024-01-01 10:05:00"), 0.0),
        (1, "x", T("2024-01-01 10:15:00"), 0.0),
        (1, "x", None, 0.0),  # used to inflate the pandas path's n_gaps
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    got_pandas = _rows(exact_median_gap(df))
    got_native = _rows(median_gap_native(df))
    assert got_pandas == got_native == [(1, 2, 450.0)]


def test_histogram_quantiles_nan_domain_raises_actionably(spark):
    with pytest.raises(ValueError, match="NaN"):
        histogram_quantiles(
            _ev(spark, CLEAN), "value", "event_type",
            lo=9.0, hi=float("nan"),
        )


def test_hll_junk_rows_confined_and_str_group_accepted(spark):
    """Pin: hll_distinct with junk — NULL values are filtered (already
    guarded), a NULL group forms its own confined row (SQL GROUP BY
    semantics), real groups' estimates are unchanged. Also pins the
    str-vs-list group_cols fix: a bare "grp" used to splat into
    per-character column names and fail with an UNRESOLVED_COLUMN
    error three calls deep."""
    from yandex_tracker_exporter_spark.operators.sketches import hll_distinct

    clean = [("a", f"v{i}") for i in range(20)] + [
        ("b", f"v{i}") for i in range(5)
    ]
    dirty = clean + [("a", None), (None, "v1"), (None, None)]
    schema = "grp string, val string"

    def est(rows):
        # group_cols as a bare string exercises the normalization
        return {
            r[0]: r[1]
            for r in hll_distinct(
                spark.createDataFrame(rows, schema), "val", "grp"
            ).collect()
        }

    got_clean, got_dirty = est(clean), est(dirty)
    assert got_dirty.pop(None) == 1  # null group: confined, own row
    assert got_dirty == got_clean


def test_histogram_quantiles_caller_pattern_nan_safe(spark):
    """The q_histogram_quantiles derivation: NaN-filtered min/max gives
    the same domain (and estimates) with junk present as without."""
    v = F.col("value").cast("double")

    def run(rows):
        df = _ev(spark, rows)
        lo, hi = df.where(~F.isnan(v)).agg(F.min(v), F.max(v)).collect()[0]
        return _rows(
            histogram_quantiles(df, "value", "event_type", lo=lo, hi=hi)
        )

    # only the null/NaN VALUE rows are junk to a value histogram — the
    # null-ts row's 5.0 is a legitimate measurement here (ts is
    # irrelevant to a value distribution) and must widen the domain
    assert run(CLEAN + JUNK_VALUES[:2]) == run(CLEAN)
