"""Business-hours interval duration (reference P6 — the hardest scalar).

The reference computes it per-row in Python with ``businesstimedelta`` +
``holidays.RU()`` (``helpers.py:40-73``). Two implementations here:

1. ``business_seconds`` — **pure Spark expression** (the default and the
   100 TB path): closed-form. Only the two boundary days need clipping
   against the business window; every interior day contributes the full
   window length iff its weekday is a workday and it is not a holiday,
   so interior days are COUNTED (one O(1) weekday-count term per
   configured workday, one containment term per configured holiday)
   rather than expanded. Entirely JVM-side, whole-stage codegen, no
   arrays, no shuffle, no Python — and constant cost for any span
   (the round-2 ``sequence()`` expansion nulled out past ~3 years).

2. ``business_seconds_pandas_udf`` — Arrow-vectorized pandas UDF with
   the same day-clipping arithmetic in numpy, kept as a reference
   implementation / escape hatch for calendar rules the expression form
   cannot express.

Holidays are **data** (a broadcast-able literal array / dimension), not a
hardcoded country module — the reference's ``holidays.RU()`` is a config
default, not a semantic.

Semantics parity (``tests/test_helpers.py:50-86``): result is
``abs(int(seconds))`` — reversed intervals count positively; a Sunday
interval is 0; a 10:00→23:00 workday with 09-22 hours clips to 12h.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

def _qident(name: str) -> str:
    """Backtick-quote a column name for the SQL fast path."""
    return "`" + name.replace("`", "``") + "`"


def _business_seconds_sql(
    start: str,
    end: str,
    workdays: tuple[int, ...],
    hour_start: int,
    hour_end: int,
    holiday_dates: tuple[str, ...],
) -> str:
    """SQL text of :func:`business_seconds` — the whole closed form
    rendered as ONE string parsed JVM-side in a single py4j call
    instead of ~800 Column-op round trips (r12 batch 6: construction
    profile showed 1,655 py4j round trips for the business-hours
    query, ~0.45 s of pure driver latency inside every timed bench
    sample). Same expression shape as the Column path; every term is
    integer/date arithmetic so results are exactly equal (pinned:
    tests/test_functions.py::test_business_seconds_sql_twin_matches_column_path).
    """
    import datetime as _dt

    s0, e0 = _qident(start), _qident(end)
    s = f"least({s0}, {e0})"
    e = f"greatest({s0}, {e0})"
    window_len = (hour_end - hour_start) * 3600
    wd_arr = "array(" + ", ".join(str(d) for d in workdays) + ")"
    hol_arr = (
        "array("
        + ", ".join(f"CAST('{d}' AS DATE)" for d in holiday_dates)
        + ")"
    )

    def day_overlap(day: str) -> str:
        window_start = f"({day} + INTERVAL {hour_start} HOURS)"
        window_end = f"({day} + INTERVAL {hour_end} HOURS)"
        overlap = (
            f"(unix_timestamp(least({e}, {window_end})) - "
            f"unix_timestamp(greatest({s}, {window_start})))"
        )
        is_workday = f"array_contains({wd_arr}, weekday({day}))"
        not_holiday = (
            f"(NOT coalesce(array_contains({hol_arr}, to_date({day})), "
            "false))"
        )
        return (
            f"CASE WHEN {is_workday} AND {not_holiday} "
            f"THEN greatest({overlap}, 0) ELSE CAST(0 AS BIGINT) END"
        )

    d0, d1 = f"to_date({s})", f"to_date({e})"
    a = f"date_add({d0}, 1)"
    n_int = f"datediff({d1}, {a})"
    wa = f"weekday({a})"

    def weekday_count(w: int) -> str:
        r = f"((({w} - {wa}) % 7 + 7) % 7)"
        return (
            f"CAST(CASE WHEN {n_int} > {r} "
            f"THEN floor(({n_int} - 1 - {r}) / 7) + 1 "
            f"ELSE 0 END AS BIGINT)"
        )

    if workdays:
        interior_workdays = "(" + " + ".join(
            weekday_count(w) for w in workdays
        ) + ")"
    else:
        interior_workdays = "CAST(0 AS BIGINT)"

    interior_holidays = "CAST(0 AS BIGINT)"
    for h in holiday_dates:
        if _dt.date.fromisoformat(h).weekday() not in workdays:
            continue
        hd = f"CAST('{h}' AS DATE)"
        interior_holidays = (
            f"({interior_holidays} + CAST(CASE WHEN {hd} > {d0} AND "
            f"{hd} < {d1} THEN 1 ELSE 0 END AS BIGINT))"
        )

    d0t, d1t = f"date_trunc('DAY', {s})", f"date_trunc('DAY', {e})"
    total = (
        f"({day_overlap(d0t)} + "
        f"CASE WHEN {d1} > {d0} THEN {day_overlap(d1t)} "
        f"ELSE CAST(0 AS BIGINT) END + "
        f"CAST({window_len} AS BIGINT) * "
        f"({interior_workdays} - {interior_holidays}))"
    )
    # guard on s/e (least/greatest), NOT the raw columns: Spark's
    # least/greatest SKIP nulls, so a one-sided NULL leaves s = e =
    # the non-null endpoint and the Column path computes 0 for it —
    # the guard only fires when BOTH endpoints are NULL. The twin must
    # reproduce that exactly (caught by the twin pin test).
    return (
        f"CASE WHEN {s} IS NULL OR {e} IS NULL "
        f"THEN CAST(NULL AS BIGINT) ELSE {total} END"
    )


def business_seconds(
    start: Column | str,
    end: Column | str,
    workdays: tuple[int, ...] = (0, 1, 2, 3, 4),
    hour_start: int = 9,
    hour_end: int = 22,
    holiday_dates: tuple[str, ...] = (),
) -> Column:
    """Seconds of [start, end) that fall inside business hours.

    ``workdays`` uses Python weekday numbering (Mon=0..Sun=6) to match
    the reference config (``config.py:193``). Closed-form: O(1) per row
    for any interval width — no span cap.

    String column names take the SQL fast path (one JVM parse);
    Column inputs keep the expression-builder path. Equal results
    pinned by test_business_seconds_sql_twin_matches_column_path.
    """
    import datetime as _dt

    if isinstance(start, str) and isinstance(end, str):
        return F.expr(
            _business_seconds_sql(
                start, end, workdays, hour_start, hour_end, holiday_dates
            )
        )

    s0 = F.col(start) if isinstance(start, str) else start
    e0 = F.col(end) if isinstance(end, str) else end
    # abs() semantics: order the endpoints.
    s = F.least(s0, e0)
    e = F.greatest(s0, e0)

    window_len = (hour_end - hour_start) * 3600

    # Spark weekday(): Mon=0..Sun=6 — same numbering as the config.
    workdays_arr = F.array(*[F.lit(d) for d in workdays])
    holidays_arr = F.array(*[F.lit(d).cast("date") for d in holiday_dates])

    def day_overlap(day: Column) -> Column:
        """Boundary-day clip: full [s, e) ∩ [day+hs, day+he), gated on
        workday/holiday — identical to expanding that single day."""
        window_start = day + F.expr(f"interval {hour_start} hours")
        window_end = day + F.expr(f"interval {hour_end} hours")
        overlap = F.unix_timestamp(F.least(e, window_end)) - F.unix_timestamp(
            F.greatest(s, window_start)
        )
        is_workday = F.array_contains(workdays_arr, F.weekday(day))
        not_holiday = ~F.coalesce(
            F.array_contains(holidays_arr, F.to_date(day)), F.lit(False)
        )
        return F.when(is_workday & not_holiday, F.greatest(overlap, F.lit(0))).otherwise(
            F.lit(0).cast("long")
        )

    d0, d1 = F.to_date(s), F.to_date(e)
    # interior days are (d0, d1) EXCLUSIVE: [a .. a+n_int-1]
    a = F.date_add(d0, 1)
    n_int = F.datediff(d1, a)  # count of interior days; <= 0 means none
    wa = F.weekday(a)

    # count of interior days whose weekday == w, closed form:
    # positions i in [0, n_int) with (wa + i) % 7 == w
    def weekday_count(w: int) -> Column:
        r = ((F.lit(w) - wa) % 7 + 7) % 7
        return F.when(
            n_int > r, F.floor((n_int - 1 - r) / 7) + 1
        ).otherwise(F.lit(0)).cast("long")

    interior_workdays = None
    for w in workdays:
        term = weekday_count(w)
        interior_workdays = term if interior_workdays is None else interior_workdays + term
    if interior_workdays is None:
        interior_workdays = F.lit(0).cast("long")

    # interior holidays that would otherwise count as workdays: the
    # holiday list is a config literal, so its weekday is known in Python
    interior_holidays = F.lit(0).cast("long")
    for h in holiday_dates:
        if _dt.date.fromisoformat(h).weekday() not in workdays:
            continue
        hd = F.lit(h).cast("date")
        interior_holidays = interior_holidays + F.when(
            (hd > d0) & (hd < d1), F.lit(1)
        ).otherwise(F.lit(0)).cast("long")

    d0t, d1t = F.date_trunc("DAY", s), F.date_trunc("DAY", e)
    total = (
        day_overlap(d0t)
        + F.when(d1 > d0, day_overlap(d1t)).otherwise(F.lit(0).cast("long"))
        + F.lit(window_len).cast("long") * (interior_workdays - interior_holidays)
    )
    return F.when(s.isNull() | e.isNull(), F.lit(None).cast("long")).otherwise(total)


def business_seconds_pandas_udf(
    workdays: tuple[int, ...] = (0, 1, 2, 3, 4),
    hour_start: int = 9,
    hour_end: int = 22,
    holiday_dates: tuple[str, ...] = (),
):
    """Arrow-vectorized pandas UDF with identical semantics.

    Returned as a udf object: ``udf = business_seconds_pandas_udf();
    df.select(udf("start", "end"))``. Kept for calendar rules beyond the
    expression form (e.g. per-queue calendars); ~numpy-vectorized per
    batch, no per-row Python.
    """
    holiday_set = frozenset(pd.Timestamp(d).date() for d in holiday_dates)
    workday_set = frozenset(workdays)

    @pandas_udf("long")
    def _business_seconds(start: pd.Series, end: pd.Series) -> pd.Series:
        lo = np.minimum(start.values, end.values)
        hi = np.maximum(start.values, end.values)
        out = np.zeros(len(start), dtype="float64")
        lo_days = pd.Series(lo).dt.normalize()
        hi_days = pd.Series(hi).dt.normalize()
        for i in range(len(start)):
            if pd.isna(lo[i]) or pd.isna(hi[i]):
                out[i] = np.nan
                continue
            days = pd.date_range(lo_days.iloc[i], hi_days.iloc[i], freq="D")
            mask = np.array(
                [d.weekday() in workday_set and d.date() not in holiday_set for d in days]
            )
            win_lo = np.maximum(
                (days + pd.Timedelta(hours=hour_start)).values, lo[i]
            )
            win_hi = np.minimum((days + pd.Timedelta(hours=hour_end)).values, hi[i])
            secs = (win_hi - win_lo) / np.timedelta64(1, "s")
            out[i] = np.where(mask, np.maximum(secs, 0), 0).sum()
        return pd.Series(out).astype("Int64")

    return _business_seconds
