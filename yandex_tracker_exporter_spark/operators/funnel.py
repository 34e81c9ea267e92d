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
    ev = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_timestamp(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("y"),
            )
        )
    )
    grouped = events.groupBy(user_col).agg(ev.alias("_ev"))

    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(0).cast("long").alias("t0"),
        F.lit(0).cast("long").alias("tp"),
    )

    def step(acc: Column, e: Column) -> Column:
        # anchor: first occurrence of steps[0]
        out = F.when(
            (acc["level"] == 0) & (e["y"] == steps[0]),
            F.struct(
                F.lit(1).alias("level"), e["t"].alias("t0"), e["t"].alias("tp")
            ),
        )
        # advance: next step type, strictly later, within the window
        for k in range(1, len(steps)):
            out = out.when(
                (acc["level"] == k)
                & (e["y"] == steps[k])
                & (e["t"] > acc["tp"])
                & (e["t"] <= acc["t0"] + window_seconds),
                F.struct(
                    F.lit(k + 1).alias("level"),
                    acc["t0"].alias("t0"),
                    e["t"].alias("tp"),
                ),
            )
        return out.otherwise(acc)

    level = F.aggregate(F.col("_ev"), init, step)["level"]
    return grouped.select(
        F.col(user_col), level.cast("long").alias("funnel_level")
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
    hour = F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).cast("long")
    counts = events.groupBy(
        hour.alias("hour_epoch"), F.col(type_col).alias("type")
    ).agg(F.count(F.lit(1)).alias("_n"))

    span = counts.agg(
        F.min("hour_epoch").alias("lo"), F.max("hour_epoch").alias("hi")
    ).collect()[0]
    hours = events.sparkSession.range(1).select(
        F.explode(
            F.sequence(F.lit(span.lo), F.lit(span.hi), F.lit(3600))
        ).alias("hour_epoch")
    )
    types = counts.select("type").distinct()
    grid = hours.crossJoin(types)
    return (
        counts.join(F.broadcast(grid), ["hour_epoch", "type"], "right")
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
