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

from pyspark.sql import Column, DataFrame
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
