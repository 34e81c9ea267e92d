"""Round-7 operator-surface review: latent-input shapes (non-numeric
keys, empty inputs, constant series, NULL values, zero denominators)
that used to crash tasks under Spark 4's default ANSI mode or silently
corrupt results. Contract fixtures never hit these shapes — every fix
is pinned result-neutral by the manifest sweep — so these tests are
the only thing keeping the library surface honest for real corpora.
"""

import pytest
from pyspark.sql import functions as F


def test_bloom_semi_join_infers_string_key_family(spark):
    """String join keys must take the text hash family by default —
    the old integer-family default cast 'u_123' to long: an ANSI crash
    or, with ANSI off, a NULL position that dropped the WHOLE corpus
    (100% false negatives on a no-false-negatives operator)."""
    from yandex_tracker_exporter_spark.operators.bloom import bloom_semi_join

    corpus = spark.createDataFrame(
        [(f"u_{i}", i) for i in range(50)], "k string, v long"
    )
    keys = spark.createDataFrame(
        [(f"u_{i}",) for i in range(0, 50, 10)], "k string"
    )
    kept = {r["k"] for r in bloom_semi_join(corpus, "k", keys, "k").collect()}
    # no false negatives: every real key survives
    assert {f"u_{i}" for i in range(0, 50, 10)} <= kept
    # and integer keys still take the integer family (no behavior change)
    corpus_i = spark.createDataFrame([(i, i) for i in range(50)], "k long, v long")
    keys_i = spark.createDataFrame([(i,) for i in range(0, 50, 10)], "k long")
    kept_i = {r["k"] for r in bloom_semi_join(corpus_i, "k", keys_i, "k").collect()}
    assert set(range(0, 50, 10)) <= kept_i


def test_scd2_intervals_string_values(spark):
    """value_type=None keeps the classic string-valued SCD2 attribute
    (a status) — the old force-cast to long nulled every value and
    collapsed all history into one run."""
    import datetime as dt

    from yandex_tracker_exporter_spark.operators.temporal import (
        SCD2_OPEN_END,
        scd2_intervals,
    )

    rows = [
        (7, 1, dt.datetime(2024, 1, 1, 0), '{"k": "open"}'),
        (7, 2, dt.datetime(2024, 1, 1, 1), '{"k": "open"}'),
        (7, 3, dt.datetime(2024, 1, 1, 2), '{"k": "closed"}'),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "props"])
    out = sorted(
        (r["value"], r["is_current"])
        for r in scd2_intervals(df, value_type=None).collect()
    )
    assert out == [("closed", 1), ("open", 0)]


def test_reset_running_total_string_event_ids(spark):
    """The event id is an opaque passthrough: UUID-style ids must
    survive (the old cast-to-long nulled them all)."""
    import datetime as dt

    from yandex_tracker_exporter_spark.operators.temporal import (
        reset_running_total,
    )

    rows = [
        (1, "ev-a", dt.datetime(2024, 1, 1, 0), 1.00),
        (1, "ev-b", dt.datetime(2024, 1, 1, 0, 30), 2.00),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    out = {r["event_id"]: r["running_cents"] for r in reset_running_total(df).collect()}
    assert out == {"ev-a": 100, "ev-b": 300}


def test_rolling_corr_constant_series_is_null(spark):
    """A 7-day window where one series is constant has UNDEFINED
    Pearson r: null, never an ANSI divide-by-zero task failure."""
    import datetime as dt

    from yandex_tracker_exporter_spark.operators.funnel import rolling_corr_7d

    rows = []
    eid = 0
    for d in range(8):
        ts = dt.datetime(2024, 1, 1 + d)
        rows.append((eid, ts, 1, "view", 5.0, None)); eid += 1  # constant
        rows.append((eid, ts, 1, "click", float(d), None)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    out = rolling_corr_7d(df).collect()
    assert out and all(r["r"] is None for r in out)


def test_weekday_seasonality_zero_total_is_null(spark):
    """All-zero cents (values < 0.01) make the per-type total 0: the
    index is undefined → null, not an ANSI crash."""
    import datetime as dt

    from yandex_tracker_exporter_spark.operators.funnel import (
        weekday_seasonality,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 7), 1, "ping", 0.001, None)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    out = weekday_seasonality(df).collect()
    assert out and all(r["index_milli"] is None for r in out)


def test_gap_fill_hourly_empty_input(spark):
    """Empty input yields an empty grid, not an unresolvable
    sequence(NULL, NULL) AnalysisException at plan time."""
    from yandex_tracker_exporter_spark.operators.funnel import gap_fill_hourly

    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    assert gap_fill_hourly(df).count() == 0


def test_event_pattern_rejects_hostile_and_empty_patterns(spark):
    from yandex_tracker_exporter_spark.operators.funnel import (
        event_pattern_count,
    )

    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    with pytest.raises(ValueError, match="non-empty"):
        event_pattern_count(df, pattern="")
    with pytest.raises(ValueError, match="alphanumeric"):
        event_pattern_count(df, pattern="a'b")


def test_hll_and_kmv_ignore_null_values(spark):
    """NULL values must not bias sketches: the phantom NULL register
    inflated HLL estimates, and the NULL hash consumed a KMV bottom-k
    slot (nulls sort first) before collect_list dropped it."""
    from yandex_tracker_exporter_spark.operators.sketches import (
        hll_distinct,
        kmv_bottom_k,
    )

    with_nulls = spark.createDataFrame(
        [("g", str(i)) for i in range(100)] + [("g", None)] * 25,
        "grp string, v string",
    )
    without = spark.createDataFrame(
        [("g", str(i)) for i in range(100)], "grp string, v string"
    )
    est_w = hll_distinct(with_nulls, "v", ["grp"]).collect()[0]["est_distinct"]
    est_wo = hll_distinct(without, "v", ["grp"]).collect()[0]["est_distinct"]
    assert est_w == est_wo
    kmv_w = kmv_bottom_k(with_nulls, "v", "grp", k=16).collect()[0]["kmv"]
    kmv_wo = kmv_bottom_k(without, "v", "grp", k=16).collect()[0]["kmv"]
    assert kmv_w == kmv_wo and len(kmv_w) == 16


def test_bloom_semi_join_mixed_key_type_classes_raise(spark):
    """ADVICE r7: inference from the keys side alone still hashed a
    string CORPUS key with the integer family (or vice versa) — the
    same silent 100%-false-negative drop. Mixed type classes now raise
    loud; explicit text_keys remains the caller's override."""
    import pytest

    from yandex_tracker_exporter_spark.operators.bloom import bloom_semi_join

    corpus_s = spark.createDataFrame(
        [(f"u_{i}", i) for i in range(10)], "k string, v long"
    )
    keys_i = spark.createDataFrame([(1,), (2,)], "k long")
    with pytest.raises(TypeError, match="type classes disagree"):
        bloom_semi_join(corpus_s, "k", keys_i, "k")
    corpus_i = spark.createDataFrame([(i, i) for i in range(10)], "k long, v long")
    keys_s = spark.createDataFrame([("u_1",)], "k string")
    with pytest.raises(TypeError, match="type classes disagree"):
        bloom_semi_join(corpus_i, "k", keys_s, "k")
