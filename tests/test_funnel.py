"""window_funnel unit tests — crafted chains covering anchor, window
expiry, ordering, and greedy semantics."""

import datetime as dt

import pytest

from yandex_tracker_exporter_spark.operators.funnel import window_funnel

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), y) for u, s, y in rows],
        "user_id long, ts timestamp, event_type string",
    )


STEPS = ["view", "click", "purchase"]


def _levels(spark, rows, window=3600):
    df = _events(spark, rows)
    return {
        r.user_id: r.funnel_level
        for r in window_funnel(df, STEPS, window).collect()
    }


def test_full_chain_within_window(spark):
    rows = [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")]
    assert _levels(spark, rows) == {1: 3}


def test_chain_broken_by_window_expiry(spark):
    # purchase lands after the window anchored at the first view
    rows = [(1, 0, "view"), (1, 10, "click"), (1, 4000, "purchase")]
    assert _levels(spark, rows) == {1: 2}


def test_out_of_order_types_do_not_count(spark):
    # click before any view: no anchor yet
    rows = [(1, 0, "click"), (1, 10, "purchase"), (1, 20, "view")]
    assert _levels(spark, rows) == {1: 1}


def test_strictly_increasing_timestamps_required(spark):
    # click at the same second as the view does not advance
    rows = [(1, 0, "view"), (1, 0, "click"), (1, 20, "purchase")]
    assert _levels(spark, rows) == {1: 1}


def test_anchor_is_first_view_greedy(spark):
    # first view at t=0 expires; a later view at t=3500 would complete,
    # but greedy semantics anchor at the first occurrence (the window is
    # inclusive at t0+window, so the chain must start strictly past it)
    rows = [
        (1, 0, "view"),
        (1, 3500, "view"),
        (1, 3601, "click"),
        (1, 3700, "purchase"),
    ]
    assert _levels(spark, rows) == {1: 1}


def test_unrelated_events_are_ignored(spark):
    rows = [
        (1, 0, "view"),
        (1, 5, "error"),
        (1, 10, "click"),
        (1, 11, "signup"),
        (1, 20, "purchase"),
    ]
    assert _levels(spark, rows) == {1: 3}


def test_user_with_no_steps_reports_level_zero(spark):
    rows = [(1, 0, "error"), (2, 0, "view")]
    assert _levels(spark, rows) == {1: 0, 2: 1}


def test_empty_steps_rejected(spark):
    with pytest.raises(ValueError):
        window_funnel(_events(spark, [(1, 0, "view")]), [], 10)


class TestCohortRetention:
    def test_triangle_counts(self, spark):
        from yandex_tracker_exporter_spark.operators.funnel import (
            cohort_retention,
        )

        # week of 2024-01-01 (Mon) and 2024-01-08
        w0 = dt.datetime(2024, 1, 3, 10, 0)   # cohort week 0
        w1 = dt.datetime(2024, 1, 10, 10, 0)  # week 1
        w2 = dt.datetime(2024, 1, 17, 10, 0)  # week 2
        rows = [
            (1, w0), (1, w1), (1, w2),   # active all three weeks
            (2, w0), (2, w2),            # skips week 1
            (3, w1),                     # later cohort
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r.cohort_week, r.week_offset): r.n_users
            for r in cohort_retention(df).collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 2): 2,
            ("2024-01-08", 0): 1,
        }

    def test_duplicate_events_in_week_count_once(self, spark):
        from yandex_tracker_exporter_spark.operators.funnel import (
            cohort_retention,
        )

        w0 = dt.datetime(2024, 1, 3, 10, 0)
        rows = [(1, w0), (1, w0 + dt.timedelta(hours=5)), (1, w0 + dt.timedelta(days=1))]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = cohort_retention(df).collect()
        assert len(got) == 1 and got[0].n_users == 1 and got[0].week_offset == 0


class TestGapFillHourly:
    def test_zero_fills_missing_slots(self, spark):
        from yandex_tracker_exporter_spark.operators.funnel import (
            gap_fill_hourly,
        )

        t0 = dt.datetime(2024, 1, 1, 10, 0)
        rows = [
            (1, t0, "a"),
            (2, t0, "a"),
            (3, t0 + dt.timedelta(hours=2), "a"),   # hour 11 missing
            (4, t0, "b"),                            # b only in hour 10
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        got = {
            (r.hour_epoch, r.type): r.n_events
            for r in gap_fill_hourly(df).collect()
        }
        h0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
        # dense grid: 3 hours x 2 types = 6 slots
        assert len(got) == 6
        assert got[(h0, "a")] == 2
        assert got[(h0 + 3600, "a")] == 0
        assert got[(h0 + 7200, "a")] == 1
        assert got[(h0, "b")] == 1
        assert got[(h0 + 3600, "b")] == 0
        assert got[(h0 + 7200, "b")] == 0


def test_funnel_conversion_monotone_and_consistent(spark):
    """Reached counts are non-increasing with level; conv_milli is the
    exact integer ratio against the previous level; level 1 pins 1000."""
    import __spark_entry__ as entry_mod

    rows = sorted(
        entry_mod.queries()["funnel_conversion"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["level"],
    )
    assert [r["step"] for r in rows] == ["view", "click", "purchase"]
    assert rows[0]["conv_milli"] == 1000
    for a, b in zip(rows, rows[1:]):
        assert b["n_reached"] <= a["n_reached"]
        assert b["conv_milli"] == b["n_reached"] * 1000 // a["n_reached"]


def test_funnel_conversion_emits_skipped_levels(spark):
    """ADVICE r4 regression: when no user stops EXACTLY at a middle
    level (here every user reaches view+purchase but the funnel's
    'click' level has no exact-stoppers), the level must still appear
    with n_reached carried down from above, and level 3's conversion
    must divide by level 2 — not level 1. The oracle mirrors the engine
    CTE shape, so only a unit test can catch this class of bug."""
    import datetime as dt

    from yandex_tracker_exporter_spark.operators.funnel import funnel_conversion

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # 3 users complete the whole funnel; 1 user stops at level 1
    for u in range(3):
        rows += [
            (u, t0, "view"),
            (u, t0 + dt.timedelta(seconds=10), "click"),
            (u, t0 + dt.timedelta(seconds=20), "purchase"),
        ]
    rows.append((99, t0, "view"))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["level"]: (r["step"], r["n_reached"], r["conv_milli"])
        for r in funnel_conversion(df, ["view", "click", "purchase"], 3600).collect()
    }
    assert set(out) == {1, 2, 3}, "missing funnel levels in output"
    assert out[1] == ("view", 4, 1000)
    # nobody stops exactly at click, but 3 users REACHED it
    assert out[2] == ("click", 3, 750)
    # conversion vs level 2 (1000), not vs level 1 (would be 750)
    assert out[3] == ("purchase", 3, 1000)


def test_funnel_conversion_empty_events_all_levels_zero(spark):
    """Degenerate input: all levels present with 0 users and conv 0
    (the prev=0 guard; an unguarded integer div would raise under
    ANSI)."""
    from yandex_tracker_exporter_spark.operators.funnel import funnel_conversion

    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    out = {
        r["level"]: (r["n_reached"], r["conv_milli"])
        for r in funnel_conversion(df, ["view", "click", "purchase"], 3600).collect()
    }
    assert out == {1: (0, 0), 2: (0, 0), 3: (0, 0)}


def test_top_paths_counts_consecutive_triples(spark):
    import datetime as dt

    from yandex_tracker_exporter_spark.operators.funnel import top_paths

    t0 = dt.datetime(2024, 1, 1)
    seq = ["view", "click", "purchase", "view", "click"]
    rows = [
        (1, i, ty, t0 + dt.timedelta(minutes=i)) for i, ty in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    got = {r["path"]: r["n_occurrences"] for r in top_paths(df).collect()}
    assert got == {
        "view > click > purchase": 1,
        "click > purchase > view": 1,
        "purchase > view > click": 1,
    }


def test_ewma_daily_matches_python_fold(spark):
    """The array-accumulator fold must equal the plain Python recursion
    bit-for-bit (same IEEE op order)."""
    import datetime as dt

    from yandex_tracker_exporter_spark.operators.funnel import ewma_daily

    rows = []
    eid = 0
    for day in range(5):
        for k in range(3):
            rows.append(
                (
                    eid,
                    "view",
                    dt.datetime(2024, 1, 1 + day, 6 + k),
                    10.0 * (day + 1) + k,
                )
            )
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])
    got = sorted(
        (r["day_epoch"], r["day_mean"], r["ewma"])
        for r in ewma_daily(df).collect()
    )
    means = [m for _, m, _ in got]
    expect = []
    for m in means:
        expect.append(m if not expect else 0.3 * m + 0.7 * expect[-1])
    assert [e for _, _, e in got] == expect


def test_ewma_sql_fold_matches_column_fold(spark):
    """r12 batch 6: ewma_daily builds its array-accumulator fold as one
    SQL string (α embedded as repr'd double literals). Pin it against
    the original Column-built fold run over the SAME daily relation:
    every ewma value must be BIT-identical (raw float bits), including
    a non-default alpha whose repr carries many digits."""
    import datetime as dt
    import struct

    from pyspark.sql import functions as F

    from yandex_tracker_exporter_spark.operators.funnel import ewma_daily

    rows = []
    eid = 0
    for day in range(9):
        for k in range(1 + (day % 3)):
            for ty in ("view", "click"):
                rows.append(
                    (
                        eid,
                        ty,
                        dt.datetime(2024, 1, 1 + day, 6 + k),
                        10.37 * (day + 1) + k / 3.0,
                    )
                )
                eid += 1
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])

    for alpha_milli in (300, 137):
        got = ewma_daily(df, alpha_milli=alpha_milli)
        alpha = alpha_milli / 1000.0
        # original Column-built fold, verbatim from pre-r12 ewma_daily,
        # rebuilt over the identical daily relation
        day_epoch = F.floor(
            F.unix_timestamp(F.date_trunc("day", F.col("ts")))
        ).cast("long")
        cents = F.floor(F.col("value") * 100).cast("long")
        daily = (
            df.select(
                F.col("event_type").alias("event_type"),
                day_epoch.alias("day_epoch"),
                cents.alias("_c"),
            )
            .groupBy("event_type", "day_epoch")
            .agg(F.sum("_c").alias("_sum"), F.count(F.lit(1)).alias("_n"))
            .select(
                "event_type",
                "day_epoch",
                (
                    F.col("_sum").cast("double") / F.col("_n").cast("double")
                ).alias("day_mean"),
            )
        )
        series = daily.groupBy("event_type").agg(
            F.array_sort(
                F.collect_list(F.struct("day_epoch", "day_mean"))
            ).alias("_days")
        )
        folded = series.select(
            "event_type",
            "_days",
            F.aggregate(
                F.col("_days"),
                F.array().cast("array<double>"),
                lambda acc, d: F.concat(
                    acc,
                    F.array(
                        F.when(F.size(acc) == 0, d["day_mean"]).otherwise(
                            F.lit(alpha) * d["day_mean"]
                            + F.lit(1.0 - alpha) * F.element_at(acc, -1)
                        )
                    ),
                ),
            ).alias("_ewma"),
        )
        zipped = folded.select(
            "event_type",
            F.posexplode(F.arrays_zip("_days", "_ewma")).alias("_i", "_z"),
        )
        want_df = zipped.select(
            "event_type",
            F.col("_z._days.day_epoch").alias("day_epoch"),
            F.col("_z._days.day_mean").alias("day_mean"),
            F.col("_z._ewma").alias("ewma"),
        )

        def key(r):
            return (r.event_type, r.day_epoch)

        got_rows = {key(r): r for r in got.collect()}
        want_rows = {key(r): r for r in want_df.collect()}
        assert got_rows.keys() == want_rows.keys()
        for k in got_rows:
            g, w = got_rows[k], want_rows[k]
            assert struct.pack("<d", g.ewma) == struct.pack("<d", w.ewma), (
                alpha_milli,
                k,
                g.ewma,
                w.ewma,
            )
            assert g.day_mean == w.day_mean


def test_window_funnel_sql_fold_matches_column_fold(spark):
    """r12 construction fast path: window_funnel builds its fold as one
    SQL string. Pin it against the original Column-built fold (inlined
    here verbatim) — every user's level must be identical, including
    quote-bearing step names and out-of-order/over-window events."""
    import datetime as dt

    from pyspark.sql import functions as F

    from yandex_tracker_exporter_spark.operators.funnel import window_funnel

    steps = ["vi'ew", "click", "purchase"]
    base = dt.datetime(2024, 1, 1)
    rows = []
    import random

    rnd = random.Random(7)
    for u in range(50):
        for i in range(rnd.randint(0, 12)):
            rows.append(
                (
                    u,
                    rnd.choice(steps + ["other"]),
                    base + dt.timedelta(seconds=rnd.randint(0, 7200)),
                )
            )
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel(df, steps, 3600).collect()
    }

    # original Column-built fold, verbatim from pre-r12 window_funnel
    ev = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_timestamp(F.col("ts")).alias("t"),
                F.col("event_type").alias("y"),
            )
        )
    )
    grouped = df.groupBy("user_id").agg(ev.alias("_ev"))
    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(0).cast("long").alias("t0"),
        F.lit(0).cast("long").alias("tp"),
    )

    def step(acc, e):
        out = F.when(
            (acc["level"] == 0) & (e["y"] == steps[0]),
            F.struct(
                F.lit(1).alias("level"), e["t"].alias("t0"), e["t"].alias("tp")
            ),
        )
        for k in range(1, len(steps)):
            out = out.when(
                (acc["level"] == k)
                & (e["y"] == steps[k])
                & (e["t"] > acc["tp"])
                & (e["t"] <= acc["t0"] + 3600),
                F.struct(
                    F.lit(k + 1).alias("level"),
                    acc["t0"].alias("t0"),
                    e["t"].alias("tp"),
                ),
            )
        return out.otherwise(acc)

    level = F.aggregate(F.col("_ev"), init, step)["level"]
    want = {
        r.user_id: r.funnel_level
        for r in grouped.select(
            F.col("user_id"), level.cast("long").alias("funnel_level")
        ).collect()
    }
    assert got == want
