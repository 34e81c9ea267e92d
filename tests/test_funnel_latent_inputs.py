"""Round-9 operator-surface review: latent-input shapes through the
FUNNEL family (the round-8 dedup/similarity probe pattern applied to
the next unprobed family). Contract fixtures never hit these shapes —
every fix is pinned result-neutral by the manifest sweep — so these
tests keep the library surface honest for real event streams.

Bug classes this probe found and fixed (all "one junk row corrupts
REAL rows' results", none crashed):

- a null-ts anchor event pinned a window_funnel user at level 1
  forever: NULL sorts FIRST, so the anchor fired with t0=NULL and
  every later window comparison was NULL → `otherwise(acc)`;
- a null-ts event formed a NULL day that SEEDED the EWMA fold — every
  real day's ewma was contaminated through the recursion;
- lead() manufactured event_transitions (and top_paths windows) from
  the junk row to a real one, with a NULL gap poisoning sum_gap_s;
- a null-ts event's NULL day-of-week nulled weekday_seasonality's
  index_milli for EVERY real row (through the overall mean);
- gap_fill_hourly put the null TYPE into its dense grid via distinct,
  but the left join's null key never matched its own count row — the
  slot showed 0 while events existed;
- array_join SKIPS nulls, so a junk-typed event BETWEEN v and c
  vanished from event_pattern_count's string and manufactured a
  contiguous "vc" match (same class: concat_ws elision in top_paths
  collided 3-step paths containing a null type with real 2-step ones);
- a NaN value binned into value_histogram bin 0 alongside real
  measurements, and would propagate through the EWMA / rolling-corr
  folds forever.
"""

import datetime as dt

from pyspark.sql import functions as F

import yandex_tracker_exporter_spark.operators.funnel as fu

T = dt.datetime.fromisoformat
SCHEMA = "user_id long, event_type string, ts timestamp, event_id long, value double"


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_null_ts_anchor_does_not_pin_funnel_level(spark):
    rows = [
        (9, "view", None, 1, 0.0),  # junk anchor — used to pin level 1
        (9, "view", T("2024-01-01 10:00:00"), 2, 0.0),
        (9, "cart", T("2024-01-01 10:10:00"), 3, 0.0),
        (9, "buy", T("2024-01-01 10:20:00"), 4, 0.0),
    ]
    out = fu.window_funnel(_ev(spark, rows), ["view", "cart", "buy"], 3600)
    assert out.collect() == [(9, 3)]


def test_null_ts_day_does_not_seed_ewma(spark):
    rows = [
        (1, "cart", None, 1, 100.0),  # junk — used to seed the fold
        (1, "cart", T("2024-01-02 10:00:00"), 2, 10.0),
        (1, "cart", T("2024-01-03 10:00:00"), 3, 10.0),
    ]
    out = {r["day_epoch"]: r["ewma"] for r in fu.ewma_daily(_ev(spark, rows)).collect()}
    assert None not in out
    assert set(out.values()) == {1000.0}  # flat series → flat ewma


def test_null_ts_manufactures_no_transition(spark):
    rows = [(1, "a", None, 1, 0.0), (1, "b", T("2024-01-01 10:00:00"), 2, 0.0)]
    assert fu.event_transitions(_ev(spark, rows)).collect() == []


def test_null_ts_does_not_null_seasonality_index(spark):
    rows = [
        (1, "x", None, 1, 10.0),  # used to null index_milli everywhere
        (1, "x", T("2024-01-01 10:00:00"), 2, 10.0),
    ]
    out = fu.weekday_seasonality(_ev(spark, rows)).collect()
    assert [(r["dow"], r["index_milli"]) for r in out] == [(1, 1000)]


def test_gap_fill_drops_null_type_instead_of_zero_slot(spark):
    rows = [
        (1, None, T("2024-01-01 10:00:00"), 1, 0.0),
        (1, "x", T("2024-01-01 10:00:00"), 2, 0.0),
    ]
    out = fu.gap_fill_hourly(_ev(spark, rows)).collect()
    # no (hour, NULL, 0) slot lying about a count that existed
    assert [(r["type"], r["n_events"]) for r in out] == [("x", 1)]


def test_null_type_breaks_pattern_contiguity(spark):
    rows = [
        (1, "view", T("2024-01-01 10:00:00"), 1, 0.0),
        (1, None, T("2024-01-01 10:01:00"), 2, 0.0),  # junk between v and c
        (1, "cart", T("2024-01-01 10:02:00"), 3, 0.0),
        (2, "view", T("2024-01-01 10:00:00"), 4, 0.0),
        (2, "cart", T("2024-01-01 10:01:00"), 5, 0.0),
    ]
    out = {
        r["user_id"]: r["n_matches"]
        for r in fu.event_pattern_count(_ev(spark, rows), pattern="vc").collect()
    }
    assert out == {1: 0, 2: 1}  # user 1's "vc" used to be manufactured


def test_null_type_does_not_collide_paths(spark):
    rows = [
        (1, "a", T("2024-01-01 10:00:00"), 1, 0.0),
        (1, None, T("2024-01-01 10:01:00"), 2, 0.0),
        (1, "b", T("2024-01-01 10:02:00"), 3, 0.0),
        (2, "a", T("2024-01-01 10:00:00"), 4, 0.0),
        (2, "b", T("2024-01-01 10:01:00"), 5, 0.0),
        (2, "c", T("2024-01-01 10:02:00"), 6, 0.0),
    ]
    out = {r["path"]: r["n_occurrences"] for r in fu.top_paths(_ev(spark, rows)).collect()}
    # user 2's genuine path counts once; user 1's null-containing window
    # must NOT collapse to a colliding short string
    assert out["a > b > c"] == 1
    assert all("\x00" in p or p == "a > b > c" for p in out)


def test_nan_value_excluded_from_histogram_and_folds(spark):
    rows = [
        (1, "x", T("2024-01-01 10:00:00"), 1, float("nan")),
        (1, "x", T("2024-01-01 10:00:00"), 2, 1.0),
    ]
    hist = fu.value_histogram(_ev(spark, rows)).collect()
    assert [(r["bin"], r["n_events"]) for r in hist] == [(0, 1)]
    ew = fu.ewma_daily(_ev(spark, rows)).collect()
    assert all(r["ewma"] == r["ewma"] for r in ew)  # no NaN survives


def test_junk_rows_are_result_neutral_for_clean_streams(spark):
    """The guards only DROP rows that cannot participate: a clean
    corpus + junk rows must produce byte-identical results to the
    clean corpus alone. Junk is per-semantics: a null TIMESTAMP is
    junk for every time-ordered operator; a NaN VALUE is junk only for
    the value-folding ones (event_transitions rightly keeps a
    NaN-value row — it never reads the value). A null TYPE at a real
    timestamp is NOT junk for stream-adjacency operators — it is a
    real event with an unknown label and legitimately breaks
    adjacency (pinned by the pattern/paths tests above)."""
    clean_rows = [
        (u, ty, T(f"2024-01-0{d} 1{h}:00:00"), i, float(v))
        for i, (u, ty, d, h, v) in enumerate(
            [
                (1, "view", 1, 0, 1),
                (1, "cart", 1, 1, 2),
                (1, "buy", 1, 2, 3),
                (2, "view", 2, 0, 4),
                (2, "cart", 2, 3, 5),
                (3, "view", 3, 0, 6),
            ]
        )
    ]
    null_ts = [(1, "view", None, 90, 9.0), (2, "buy", None, 91, 9.0)]
    nan_val = [(3, "view", T("2024-01-03 11:00:00"), 92, float("nan"))]
    clean = _ev(spark, clean_rows)

    time_ops = [
        lambda df: fu.window_funnel(df, ["view", "cart", "buy"], 36000),
        fu.event_transitions,
        lambda df: fu.last_touch_attribution(df, "buy"),
        fu.cohort_retention,
        fu.gap_fill_hourly,
        lambda df: fu.event_pattern_count(df, pattern="vc"),
        fu.top_paths,
    ]
    value_ops = [
        fu.ewma_daily,
        fu.weekday_seasonality,
        lambda df: fu.rolling_corr_7d(df, "view", "cart"),
    ]
    dirty_time = _ev(spark, clean_rows + null_ts)
    for op in time_ops:
        got = sorted(map(tuple, op(dirty_time).collect()))
        want = sorted(map(tuple, op(clean).collect()))
        assert got == want, op
    dirty_val = _ev(spark, clean_rows + nan_val + null_ts)
    for op in value_ops:
        got = sorted(map(tuple, op(dirty_val).collect()))
        want = sorted(map(tuple, op(clean).collect()))
        assert got == want, op
    # value_histogram never reads ts — a null-ts row with a USABLE value
    # rightly counts; only the NaN row is junk for it
    hv = sorted(map(tuple, fu.value_histogram(_ev(spark, clean_rows + nan_val)).collect()))
    assert hv == sorted(map(tuple, fu.value_histogram(clean).collect()))
