"""Windowed funnel analysis — ClickHouse ``windowFunnel`` parity.

The reference ships its data INTO ClickHouse precisely for this class
of event-sequence analytics; this operator closes the loop on the Spark
side: for each user, the deepest prefix of an ordered step list
(``view → click → purchase``) completed with strictly increasing
timestamps, all within ``window_seconds`` of the FIRST matched step.

Semantics (deterministic, greedy-from-first-occurrence): the chain
anchors at the user's first occurrence of ``steps[0]``; each next step
must be the first occurrence of its type strictly after the previous
matched step and within the window of the anchor. (ClickHouse's
``windowFunnel`` explores multiple anchors; the greedy variant is
deterministic and oracle-reproducible — the divergence is documented
here deliberately.)

Scale shape: ONE shuffle (groupBy user). Each group folds its sorted
event array with an O(1) accumulator — per-user state is
``(level, anchor_ts, prev_ts)``, so memory is bounded regardless of
how deep the funnel is. Groups must fit an Arrow batch like every
collect_list aggregation; events-per-user is bounded in practice
(sessionized feeds), and the fold itself is a pure column expression —
no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _timed(events: DataFrame, ts_col: str) -> DataFrame:
    """Corrupt-event guard — the sessionize F8 posture extended to the
    funnel family (round 9). A row with no timestamp cannot participate
    in a time-ordered or time-windowed computation, but left in the
    stream it POISONS real rows, because NULL sorts FIRST in every
    ordering this family uses: a null-ts anchor pins window_funnel
    users at level 1 forever (t0=NULL nulls every window comparison),
    a null day seeds the EWMA fold and corrupts every later day's
    value, lead() manufactures transitions/paths from the junk row to
    a real one, and a NULL day-of-week nulls seasonality indices
    through the overall mean. All pinned in
    tests/test_funnel_latent_inputs.py; harness data has no null
    timestamps, so the guard is result-neutral on the contract."""
    return events.where(F.col(ts_col).isNotNull())


#: Magnitude ceiling of a real measurement (junk wave 3, round 10).
#: A FINITE-but-extreme reading is as corrupting as NaN: Spark's ANSI
#: ``CAST(1e308 AS DECIMAL(18,2))`` RAISES (one junk row kills a whole
#: decimal-sum job), ``floor(1e308 * 100)`` silently saturates to
#: Long.MAX (fabricating cents that then overflow-crash int64 sums).
#: 1e15 leaves decimal(18,2) casts (< 1e16) and cents folds
#: (1e17 « 2^63) safe with headroom; mirrored verbatim in the oracles.
MEASURABLE_MAX = 1e15


def _measurable(events: DataFrame, value_col: str) -> DataFrame:
    """NULL/NaN/extreme measure guard for value-folding operators: a
    NULL day mean (an all-null day) or a NaN propagates through the
    EWMA fold and the rolling moments FOREVER — one junk measurement
    corrupts every subsequent output row — a NaN bins arbitrarily in
    the histogram (NaN compares LARGEST under Spark ordering), and a
    finite-but-extreme magnitude crashes ANSI decimal casts or
    saturates floor() into fabricated cents (see MEASURABLE_MAX)."""
    c = F.col(value_col).cast("double")
    return events.where(
        c.isNotNull() & ~F.isnan(c) & (F.abs(c) < F.lit(MEASURABLE_MAX))
    )


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: max prefix of ``steps`` completed in order
    within ``window_seconds`` of the first matched step.

    Output: user, funnel_level (0..len(steps)).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    events = _timed(events, ts_col)
    ev = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_timestamp(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("y"),
            )
        )
    )
    grouped = events.groupBy(user_col).agg(ev.alias("_ev"))

    # The whole fold as ONE SQL string (r12): the Column-built variant
    # cost ~1,400 py4j round trips per call (nested when/struct tree);
    # the parsed tree is identical — same named_struct init, same CASE
    # branch order, same comparisons — so every level is bit-equal
    # (pinned: test_window_funnel_sql_fold_matches_column_fold).
    def lit_s(v: str) -> str:
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

    branches = [
        f"WHEN acc.level = 0 AND e.y = {lit_s(steps[0])} "
        "THEN named_struct('level', 1, 't0', e.t, 'tp', e.t)"
    ]
    for k in range(1, len(steps)):
        branches.append(
            f"WHEN acc.level = {k} AND e.y = {lit_s(steps[k])} "
            f"AND e.t > acc.tp AND e.t <= acc.t0 + {window_seconds} "
            f"THEN named_struct('level', {k + 1}, 't0', acc.t0, 'tp', e.t)"
        )
    fold = (
        "aggregate(_ev, "
        "named_struct('level', 0, 't0', CAST(0 AS BIGINT), "
        "'tp', CAST(0 AS BIGINT)), "
        f"(acc, e) -> CASE {' '.join(branches)} ELSE acc END"
        ").level"
    )
    return grouped.select(
        F.col(user_col), F.expr(fold).cast("long").alias("funnel_level")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; for each (cohort, week offset), how many of that cohort were
    active — the classic retention triangle next to ``window_funnel``
    and sessionization in an event-analytics suite.

    Scale shape: ONE corpus-scale shuffle — ``groupBy(user)`` collects
    each user's distinct active weeks AND their cohort week in the same
    aggregation (``min`` + ``collect_set``, both partial-aggregable);
    the explode to (cohort, offset) pairs and the final count then run
    on the per-user relation (second, much smaller shuffle). Weeks per
    user is bounded (|weeks| ≤ corpus time span), so collect_set state
    is O(span), not O(events).

    Output: cohort_week (yyyy-MM-dd), week_offset, n_users.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    per_user = events.groupBy(user_col).agg(
        F.min(wk).alias("_cohort"),
        F.collect_set(wk).alias("_weeks"),
    )
    pairs = per_user.select(
        F.col("_cohort"),
        F.explode("_weeks").alias("_wk"),
    )
    return (
        pairs.groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("_wk"), F.col("_cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def gap_fill_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_slots: int = 2_000_000,
) -> DataFrame:
    """Dense hourly counts: every (hour, type) slot in the observed
    span, zero-filled where no events landed — the densification step
    reporting layers need (a missing row and a zero row are different
    answers).

    Scale shape: the fact side is one partial-aggregable groupBy; the
    dense grid is generated, not scanned — hours come from a two-scalar
    min/max agg exploded via ``sequence`` and types from a distinct over
    the (tiny) type dimension, cross-joined broadcast-side. The left
    join back to the counts broadcasts the GRID (span × types rows),
    so the aggregated fact relation never reshuffles.

    Output: hour_epoch, type, n_events.
    """
    # null ts has no hour slot and a null TYPE is grid-poison: distinct
    # put the null type INTO the grid but the left join's null key never
    # matched its own count row — the slot showed 0 while events existed
    events = _timed(events, ts_col).where(F.col(type_col).isNotNull())
    hour = F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).cast("long")
    counts = events.groupBy(
        hour.alias("hour_epoch"), F.col(type_col).alias("type")
    ).agg(F.count(F.lit(1)).alias("_n"))

    span = counts.agg(
        F.min("hour_epoch").alias("lo"), F.max("hour_epoch").alias("hi")
    ).collect()[0]
    if span.lo is None:
        # empty input (or all-null timestamps): an empty grid, not an
        # unresolvable sequence(NULL, NULL) AnalysisException
        return counts.select(
            "hour_epoch", "type", F.lit(0).cast("long").alias("n_events")
        ).limit(0)
    # Span-explosion rail (junk wave 3 follow-through): the grid is
    # GENERATED from min/max, so its size is data-dependent in the
    # worst way — ONE event with a corrupted clock (epoch 0, year 9999)
    # makes sequence() materialize tens of millions of hour slots and
    # cross-join them with every type. A densification that big is
    # never what the caller meant; fail loudly with the offending span
    # instead of OOMing the driver-broadcast grid.
    n_hours = (span.hi - span.lo) // 3600 + 1
    if n_hours > max_slots:
        raise ValueError(
            f"gap_fill_hourly span explosion: [{span.lo}, {span.hi}] is "
            f"{n_hours} hourly slots (> max_slots={max_slots}) — an "
            "out-of-band timestamp (corrupted clock?) is stretching the "
            "grid; filter the outlier rows or raise max_slots explicitly"
        )
    hours = events.sparkSession.range(1).select(
        F.explode(
            F.sequence(F.lit(span.lo), F.lit(span.hi), F.lit(3600))
        ).alias("hour_epoch")
    )
    types = counts.select("type").distinct()
    grid = hours.crossJoin(types)
    # grid LEFT-joins the broadcast counts: a broadcast hint on the
    # right side of a right-outer join is unsatisfiable (Spark can only
    # build the left side there) and was silently ignored — this form
    # actually delivers the documented "aggregated fact relation never
    # reshuffles" plan; counts is span×types-bounded, so broadcasting
    # it is safe at any corpus scale.
    return (
        grid.join(F.broadcast(counts), ["hour_epoch", "type"], "left")
        .select(
            "hour_epoch",
            "type",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams.

    ``lead()`` within each user's (ts, id)-ordered stream pairs every
    event with its successor; the (from, to) counts and the exact
    integer sum of gap seconds land on ≤ |types|² keys. One shuffle on
    the user key (the window), then a partial-aggregable rollup — the
    same two-exchange shape as sessionization, so it scales with users,
    not with the matrix. Gap seconds are floored epochs (both engines
    floor), summed in int64 — bit-exact anywhere.

    Reference parity: the tracker's changelog consumers derive
    status-to-status flow from the same lead-over-entity-stream shape
    (`tracker_exporter/models/issue.py` metrics loop); this generalizes
    it to an arbitrary event alphabet.
    """
    events = _timed(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    paired = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
        (F.lead(epoch).over(w) - epoch).alias("_gap_s"),
    ).where(F.col("to_type").isNotNull())
    return paired.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.sum("_gap_s").cast("long").alias("sum_gap_s"),
    )


def ewma_daily(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_milli: int = 300,
) -> DataFrame:
    """Per-type exponentially weighted moving average over the daily
    mean value — the smoothing every metrics dashboard applies, made
    cross-engine exact: the recursion ewma_t = α·x_t + (1−α)·ewma_{t−1}
    is a LEFT FOLD over the day-ordered series, built with
    ``aggregate`` appending to an array accumulator so the whole series
    comes out of one pass. α enters as two double literals parsed
    identically by any engine; every step is the same fixed-order
    IEEE +,×, so the floats match bit-for-bit (the NOTES left-fold
    rule).

    Scale shape: the corpus pays one partial-aggregable (type, day)
    shuffle; the fold runs on the calendar-bounded daily relation
    (one row per day per type — tiny at any corpus size, the
    moving_avg_daily argument). Output: event_type, day_epoch,
    day_mean, ewma.
    """
    events = _measurable(_timed(events, ts_col), value_col)
    alpha = alpha_milli / 1000.0
    day_epoch = F.floor(F.unix_timestamp(F.date_trunc("day", F.col(ts_col)))).cast(
        "long"
    )
    cents = F.floor(F.col(value_col) * 100).cast("long")
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            day_epoch.alias("day_epoch"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day_epoch")
        .agg(F.sum("_c").alias("_sum"), F.count(F.lit(1)).alias("_n"))
        .select(
            "event_type",
            "day_epoch",
            (F.col("_sum").cast("double") / F.col("_n").cast("double")).alias(
                "day_mean"
            ),
        )
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day_epoch", "day_mean"))
        ).alias("_days")
    )
    # r12 batch 6: the fold as ONE SQL string (the HOF-lambda build was
    # ~200 py4j round trips). α and 1−α embed as repr'd double literals
    # — repr round-trips exactly, so every step is the same fixed-order
    # IEEE arithmetic as the Column fold (pinned:
    # tests/test_funnel.py::test_ewma_sql_fold_matches_column_fold).
    fold = (
        "aggregate(_days, CAST(array() AS ARRAY<DOUBLE>), "
        "(acc, d) -> concat(acc, array("
        "CASE WHEN size(acc) = 0 THEN d.day_mean "
        f"ELSE {alpha!r}D * d.day_mean + "
        f"{1.0 - alpha!r}D * element_at(acc, -1) END)))"
    )
    folded = series.select(
        "event_type",
        "_days",
        F.expr(fold).alias("_ewma"),
    )
    zipped = folded.select(
        "event_type",
        F.posexplode(F.arrays_zip("_days", "_ewma")).alias("_i", "_z"),
    )
    return zipped.select(
        "event_type",
        F.col("_z._days.day_epoch").alias("day_epoch"),
        F.col("_z._days.day_mean").alias("day_mean"),
        F.col("_z._ewma").alias("ewma"),
    )


def event_pattern_count(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    pattern: str = "vcp",
) -> DataFrame:
    """Count CONTIGUOUS occurrences of an event-type pattern in each
    user's stream (view→click→purchase with nothing in between) —
    stricter than window_funnel's skip-tolerant match; the pair
    completes the sequence-mining surface.

    Each user's stream compresses to a string of type initials via the
    sort-inside-aggregate pattern (collect structs, array_sort — the
    deterministic ordered-collect from top_sources_agg); occurrences
    count by the replace-length trick, all integer. One shuffle.

    Output: user_id, seq_len, n_matches.
    """
    events = _timed(events, ts_col)
    # sentinel for a NULL type: array_join SKIPS null elements, so a
    # junk-typed event BETWEEN v and c used to vanish from the string
    # and manufacture a contiguous "vc" match; the non-alphanumeric
    # sentinel (pattern is alnum-restricted below) breaks contiguity
    # exactly like any other foreign event
    initial = F.coalesce(F.substring(F.col(type_col), 1, 1), F.lit("\x00"))
    per_user = events.select(
        F.col(user_col).alias("user_id"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(id_col).alias("id"), initial.alias("ch")
        ).alias("_s"),
    ).groupBy("user_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("_s")), lambda s: s["ch"]),
            "",
        ).alias("_seq")
    )
    plen = len(pattern)
    if plen == 0:
        raise ValueError("pattern must be non-empty")
    if not pattern.isalnum():
        # the pattern is spliced into a SQL expression: restrict it to
        # the type-initial alphabet it represents (a quote would break
        # the generated SQL — or worse, rewrite it)
        raise ValueError("pattern must be alphanumeric type initials")
    return per_user.select(
        F.col("user_id"),
        F.length("_seq").cast("long").alias("seq_len"),
        F.expr(
            f"(length(_seq) - length(replace(_seq, '{pattern}', ''))) div {plen}"
        ).alias("n_matches"),
    )


def value_histogram(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    bin_width: int = 5,
    n_bins: int = 20,
) -> DataFrame:
    """Equi-width value histogram per type: bin = clamp(floor(v / w)).
    The one-shuffle, partial-aggregable distribution profile (bounded
    key space |types| × bins) that feeds drift monitors."""
    events = _measurable(events, value_col)
    bin_col = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(float(bin_width))), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    return (
        events.select(F.col(type_col).alias("event_type"), bin_col.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    depth: int = 3,
    topk: int = 10,
) -> DataFrame:
    """Most-frequent ``depth``-step event paths (the Sankey/path-mining
    aggregate): every window of ``depth`` CONSECUTIVE events in a
    user's stream counts as one path occurrence. lead() composes the
    path inside one user-keyed window; the rollup lands on
    ≤ |types|^depth keys, and the top-k is per-partition
    TakeOrderedAndProject — never a global sort.

    Output: path (" > "-joined), n_occurrences.
    """
    events = _timed(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # sentinel BEFORE the leads: concat_ws silently elides null
    # elements, so a null-typed event mid-path used to shorten a
    # 3-step path into a string colliding with genuine 2-step paths;
    # end-of-stream detection still works because lead() itself yields
    # NULL past the last row (the sentinel only replaces null TYPES)
    typ = F.coalesce(F.col(type_col), F.lit("\x00"))
    steps = [typ] + [F.lead(typ, d).over(w) for d in range(1, depth)]
    paths = events.select(
        F.concat_ws(" > ", *steps).alias("path"),
        steps[-1].isNotNull().alias("_full"),
    ).where(F.col("_full"))
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return counted.orderBy(
        F.col("n_occurrences").desc(), F.col("path").asc()
    ).limit(topk)


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Step-to-step conversion table on top of ``window_funnel``: for
    each funnel level, how many users reached it and what fraction of
    the PREVIOUS level converted (exact milli, integer div). The
    reporting layer every funnel chart draws; one extra tiny rollup
    over the per-user levels relation.

    Output: level (1-based), step, n_reached, conv_milli (level 1 =
    1000 by definition of "reached the funnel"). Every level
    1..len(steps) is present in the output even when no user stops
    EXACTLY at it (the observed max-level counts are left-joined onto
    the full level dimension with 0 defaults) — otherwise a missing
    middle level would silently compute level k's conversion against
    level k-2. A level whose previous level has 0 users reports
    conv_milli = 0 (vacuous conversion; also keeps integer div
    ANSI-safe).
    """
    levels = window_funnel(
        events, steps, window_seconds, user_col, ts_col, type_col
    )
    observed = (
        levels.where(F.col("funnel_level") >= 1)
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    all_levels = events.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("long").alias("funnel_level")
    )
    counts = all_levels.join(F.broadcast(observed), "funnel_level", "left").select(
        "funnel_level", F.coalesce(F.col("_n"), F.lit(0)).alias("_n")
    )
    # users at level k reached every level <= k: cumulative from the top
    w = Window.orderBy(F.col("funnel_level").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    reached = counts.select(
        "funnel_level",
        F.sum("_n").over(w).cast("long").alias("n_reached"),
    )
    w2 = Window.orderBy("funnel_level")
    step_name = F.array(*[F.lit(s) for s in steps])
    return reached.select(
        F.col("funnel_level").cast("long").alias("level"),
        F.element_at(step_name, F.col("funnel_level").cast("int")).alias("step"),
        "n_reached",
        F.coalesce(F.lag("n_reached").over(w2), F.col("n_reached")).alias("_prev"),
    ).selectExpr(
        "level",
        "step",
        "n_reached",
        "CASE WHEN _prev = 0 THEN CAST(0 AS BIGINT)"
        " ELSE (n_reached * 1000) div _prev END AS conv_milli",
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 3600,
) -> DataFrame:
    """Last-touch conversion attribution: each conversion credits the
    user's most recent PRIOR non-conversion event within the window —
    the marketing-analytics join every event warehouse runs. The
    "find latest prior row" is the as-of shape done windowed:
    ``last(non-conversion, ignorenulls)`` over the (ts, id)-ordered
    user stream up to the previous row — one shuffle, no join at all.

    Output per attributed type: n_conversions, sum_gap_s (exact
    floored-epoch seconds), plus the 'unattributed' bucket for
    conversions with no qualifying touch.
    """
    events = _timed(events, ts_col)
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    base = events.select(
        F.col(user_col).alias("_user"),
        F.col(type_col).alias("_type"),
        F.col(id_col).alias("_id"),
        F.col(ts_col).alias("_ts"),
        epoch.alias("_ep"),
    )
    w = (
        Window.partitionBy("_user")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("_type") != conversion_type,
            F.struct(F.col("_ep").alias("tep"), F.col("_type").alias("tty")),
        ),
        ignorenulls=True,
    ).over(w)
    conv = base.select(
        "_type", "_ep", touch.alias("_touch")
    ).where(F.col("_type") == conversion_type)
    attributed = conv.select(
        F.when(
            F.col("_touch").isNotNull()
            & ((F.col("_ep") - F.col("_touch.tep")) <= window_seconds),
            F.col("_touch.tty"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("attributed_type"),
        F.when(
            F.col("_touch").isNotNull()
            & ((F.col("_ep") - F.col("_touch.tep")) <= window_seconds),
            F.col("_ep") - F.col("_touch.tep"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_gap"),
    )
    return attributed.groupBy("attributed_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("_gap").alias("sum_gap_s"),
    )


def weekday_seasonality(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Day-of-week seasonality index per type: mean value on each
    weekday relative to the type's overall mean, in exact milli —
    ``index = (dow_sum · total_n · 1000) div (dow_n · total_sum)``
    (the ratio-of-means identity keeps everything int64; > 1000 means
    the weekday runs hot). The classic seasonal profile, one
    partial-aggregable (type, dow) shuffle; the per-type totals come
    back from the SAME relation, so nothing rescans the corpus.

    Output: event_type, dow (1=Monday … 7=Sunday), n_events,
    index_milli.
    """
    events = _measurable(_timed(events, ts_col), value_col)
    cents = F.floor(F.col(value_col) * 100).cast("long")
    # ISO weekday: Monday = 1 (Spark dayofweek is Sunday=1 — shifted)
    dow = ((F.dayofweek(F.col(ts_col)) + 5) % 7 + 1).cast("long")
    per_dow = (
        events.select(
            F.col(type_col).alias("event_type"),
            dow.alias("dow"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "dow")
        .agg(F.sum("_c").alias("_dow_sum"), F.count(F.lit(1)).alias("n_events"))
    )
    totals = per_dow.groupBy("event_type").agg(
        F.sum("_dow_sum").alias("_tot_sum"), F.sum("n_events").alias("_tot_n")
    )
    return (
        per_dow.join(F.broadcast(totals), "event_type")
        .selectExpr(
            "event_type",
            "dow",
            "n_events",
            # DECIMAL(38,0) product: at the advertised scale (1e9
            # events × 1000 cents) the int64 product overflows ~1e23;
            # decimal matches DuckDB's automatic INT128 promotion and
            # the Python-int referee exactly. Zero total (all-zero or
            # cancelling cents) yields NULL, not an ANSI crash.
            "CASE WHEN _tot_sum <> 0 THEN"
            " CAST((CAST(_dow_sum AS DECIMAL(38,0)) * _tot_n * 1000)"
            " div (CAST(n_events AS DECIMAL(38,0)) * _tot_sum) AS BIGINT)"
            " END AS index_milli",
        )
    )


def conversion_latency(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """First-touch-to-first-conversion latency distribution: per user,
    seconds from the FIRST ``from_type`` to the FIRST ``to_type`` after
    it; the percentiles marketing calls "time to convert". One
    conditional-min aggregation per user (partial-aggregable), then
    exact percentiles over the per-user latencies — Spark
    ``percentile`` matches DuckDB ``quantile_cont`` bitwise (the
    value_percentiles precedent).

    Output (single row): n_converted, p50_s, p90_s, max_s.
    """
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col("event_type").alias("_ty"),
        epoch.alias("_ep"),
    )
    per_user = base.groupBy("_u").agg(
        F.min(F.when(F.col("_ty") == from_type, F.col("_ep"))).alias("_t0")
    )
    # NO broadcast hint: per_user is USER-cardinality (unbounded at the
    # advertised scale — one row per converting user), unlike the
    # provably bounded relations this module broadcasts elsewhere. At
    # harness scale the optimizer auto-broadcasts it anyway (below the
    # 10 MB threshold); at 1e8 users it must shuffle, not OOM.
    later = base.where(F.col("_ty") == to_type).join(
        per_user.where(F.col("_t0").isNotNull()), "_u"
    )
    lat = (
        later.where(F.col("_ep") >= F.col("_t0"))
        .groupBy("_u")
        .agg(F.min(F.col("_ep") - F.col("_t0")).alias("latency_s"))
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile(F.col("latency_s"), F.lit(0.5)).alias("p50_s"),
        F.percentile(F.col("latency_s"), F.lit(0.9)).alias("p90_s"),
        F.max("latency_s").alias("max_s"),
    )


def rolling_corr_7d(
    events: DataFrame,
    type_a: str = "view",
    type_b: str = "click",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """7-day rolling Pearson correlation between two event types' daily
    mean values — co-movement monitoring. Integer cent sums aggregate
    per (day, type); the two series align by day (pivot to two
    columns); the five rolling moments accumulate over a ROWS frame in
    exact int64 and ONE fixed-order double expression yields r per day
    (the regression_stats discipline, windowed). The frame runs over
    the calendar-bounded daily relation — tiny at any corpus scale
    (the moving_avg_daily argument), through one whitelisted
    SinglePartition exchange.

    Uses daily mean in milli (exact div) as the series value so the
    moments stay integer. Output: day_epoch, n_days (frame size), r.
    """
    # a null day would enter the 7-row frame FIRST (nulls sort first)
    # and corrupt its neighbors' moments; NaN cents poison the sums
    events = _measurable(_timed(events, ts_col), value_col)
    day_epoch = F.floor(
        F.unix_timestamp(F.date_trunc("day", F.col(ts_col)))
    ).cast("long")
    cents = F.floor(F.col(value_col) * 100).cast("long")
    daily = (
        events.where(F.col("event_type").isin([type_a, type_b]))
        .select(
            day_epoch.alias("day_epoch"),
            F.col("event_type").alias("_ty"),
            cents.alias("_c"),
        )
        .groupBy("day_epoch", "_ty")
        .agg(F.sum("_c").alias("_s"), F.count(F.lit(1)).alias("_n"))
        .selectExpr("day_epoch", "_ty", "(_s * 1000) div _n AS mean_milli")
    )
    paired = (
        daily.groupBy("day_epoch")
        .pivot("_ty", [type_a, type_b])
        .agg(F.first("mean_milli"))
        .where(F.col(type_a).isNotNull() & F.col(type_b).isNotNull())
        .select(
            "day_epoch",
            F.col(type_a).alias("_x"),
            F.col(type_b).alias("_y"),
        )
    )
    w = Window.orderBy("day_epoch").rowsBetween(-6, 0)
    m = paired.select(
        "day_epoch",
        F.count(F.lit(1)).over(w).cast("long").alias("n_days"),
        F.sum("_x").over(w).alias("_sx"),
        F.sum("_y").over(w).alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).over(w).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).over(w).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).over(w).alias("_sxy"),
    ).where(F.col("n_days") == 7)
    num = (
        F.col("n_days").cast("double") * F.col("_sxy").cast("double")
        - F.col("_sx").cast("double") * F.col("_sy").cast("double")
    )
    denx = (
        F.col("n_days").cast("double") * F.col("_sxx").cast("double")
        - F.col("_sx").cast("double") * F.col("_sx").cast("double")
    )
    deny = (
        F.col("n_days").cast("double") * F.col("_syy").cast("double")
        - F.col("_sy").cast("double") * F.col("_sy").cast("double")
    )
    return m.select(
        "day_epoch",
        "n_days",
        # constant series in a window: Pearson r is UNDEFINED — null,
        # never an ANSI divide-by-zero crash (DuckDB's x/0 is NULL, so
        # this also keeps the engines aligned on the degenerate shape)
        F.when(
            (denx > 0) & (deny > 0), num / F.sqrt(denx * deny)
        ).alias("r"),
    )
