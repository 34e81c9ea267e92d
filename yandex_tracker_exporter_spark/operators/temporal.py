"""Temporal warehouse operators: SCD2 interval construction and
session-scoped (resetting) running totals.

Both are single-shuffle window compositions — the second window in each
partitions by a REFINEMENT of the first's key, which Spark satisfies
with the existing hash distribution (ClusteredDistribution subset rule),
so no second exchange appears; plan tests pin that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .funnel import MEASURABLE_MAX

#: far-future epoch standing in for "current" SCD2 rows (NULL would be
#: engine-dependent in sort/compare paths; a sentinel is explicit)
SCD2_OPEN_END = 9_999_999_999


def _sql_type_name(value_type) -> str:
    """Normalize/validate a user-supplied cast target before it is
    interpolated into SQL text (ADVICE r10: the f-string try_cast took
    any raw string — a ``DataType`` object produced broken SQL and an
    arbitrary string reached ``F.expr`` unvalidated). Accepts what the
    old ``.cast()`` accepted: a ``DataType`` instance (normalized via
    ``simpleString()``) or a type NAME, round-tripped through Spark's
    own DDL parser so only a well-formed type ever reaches the SQL."""
    from pyspark.sql import types as T

    if isinstance(value_type, T.DataType):
        return value_type.simpleString()
    # Public parser first (``DataType.fromDDL``, PySpark 4.0+); the
    # private ``_parse_datatype_string`` only as a fallback for older
    # runtimes (ADVICE r11: the private name has no stability
    # guarantee — a rename must degrade to the public path, not turn
    # every string-typed call into an AttributeError).
    parse = getattr(T.DataType, "fromDDL", None) or getattr(
        T, "_parse_datatype_string", None
    )
    if parse is None:  # pragma: no cover - no parser in this runtime
        raise RuntimeError(
            "no Spark DDL type parser available in this PySpark build; "
            "pass value_type as a DataType instance instead of a string"
        )
    try:
        return parse(str(value_type)).simpleString()
    except Exception as exc:
        raise ValueError(
            f"scd2_intervals value_type {value_type!r} is not a Spark "
            f"SQL type name or DataType: {exc}"
        ) from None


def scd2_intervals(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_expr: str = "get_json_object(props, '$.k')",
    value_type: str | None = "long",
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension table from a change
    stream: one row per (entity, value) RUN with its validity interval
    [valid_from, valid_to) — the standard warehouse history shape
    (Kimball SCD2), derived here from raw events instead of maintained
    by MERGE triggers.

    Consecutive events carrying the same value collapse into one run
    (lag-compare keeps only change points); each run's valid_to is the
    next change's timestamp, and the open run gets the explicit
    ``SCD2_OPEN_END`` sentinel with is_current = 1.

    One shuffle: both windows (lag for change detection, lead for the
    interval close) partition by the entity and ride one sort. Epochs
    are floored seconds per the repo timestamp rule.

    Junk guard (junk_check, round 10 — the sessionize ``_timed``
    posture): a row with a NULL entity or NULL timestamp cannot anchor
    a validity interval; without the guard one junk row fabricated a
    NULL-entity history run. Dropped here and in the oracle.
    """
    events = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    # ``value_type=None`` keeps the extracted value AS IS — the normal
    # SCD2 attribute is a STRING (a status, a tier), and force-casting
    # it to long would raise under ANSI or, worse, null every value and
    # collapse all history into one run. The default "long" preserves
    # the harness contract (the fixture's $.k is numeric).
    # try_cast, not cast (junk v2, round 10): a JSON value beyond the
    # target type's range ('99999999999999999999' as LONG) raised ANSI
    # CAST_INVALID_INPUT and killed the whole history build — an
    # unparseable attribute is a NULL value (one more state in the
    # run-length encoding), not a crash. Oracles mirror with TRY_CAST.
    # The type name is interpolated into SQL text, so it must be
    # validated first (ADVICE r10): DataType objects normalize via
    # simpleString() (the old .cast() accepted them) and strings must
    # parse as a real Spark type — a typo or injection payload fails
    # loudly HERE, not as broken SQL inside the window chain.
    val = F.expr(
        f"try_cast(({value_expr}) AS {_sql_type_name(value_type)})"
        if value_type is not None
        else value_expr
    )
    w1 = Window.partitionBy("entity").orderBy("_ts", "_id")
    marked = events.select(
        F.col(user_col).alias("entity"),
        epoch.alias("_ep"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        val.alias("value"),
    ).select(
        "entity",
        "_ep",
        "_ts",
        "_id",
        "value",
        F.row_number().over(w1).alias("_rn"),
        F.lag("value").over(w1).alias("_prev"),
    )
    # change points: the run starts (rn=1 marks it explicitly — a
    # null-safe compare against lag's null would swallow a leading
    # null value) or the value differs null-safely from its predecessor
    changes = marked.where(
        (F.col("_rn") == 1) | (~F.col("value").eqNullSafe(F.col("_prev")))
    )
    w2 = Window.partitionBy("entity").orderBy("_ts", "_id")
    return changes.select(
        "entity",
        "value",
        F.col("_ep").alias("valid_from"),
        F.coalesce(F.lead("_ep").over(w2), F.lit(SCD2_OPEN_END))
        .cast("long")
        .alias("valid_to"),
        F.when(F.lead("_ep").over(w2).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_current"),
    )


def reset_running_total(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Running total that RESETS whenever the entity goes quiet for
    longer than ``gap_seconds`` — the gaps-and-islands cumulative
    (basket totals per visit, usage per burst). Two window passes over
    ONE entity shuffle: the gap flag's running sum labels sessions,
    then the cumulative sum re-partitions by (entity, session) — a
    refinement the existing hash distribution already satisfies, so
    Catalyst plans a sort, not a second exchange.

    Values are fixed-pointed to cents (the zscore_outliers convention)
    so the running sums are exact int64.

    Junk guard (junk_check, round 10 — the sessionize ``_timed`` +
    zscore ``_measurable`` posture): rows missing the entity or the
    timestamp cannot be sessioned, and a non-finite value would be
    SILENTLY fabricated into cents by Spark's saturating ``floor()``
    (``floor(NaN) = 0``) — one junk reading would shift every later
    running total in its session. All three shapes are dropped.
    """
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    cents = F.floor(F.col(value_col) * 100).cast("long")
    w = Window.partitionBy("entity").orderBy("_ts", "_id")
    events = events.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
        & (F.abs(F.col(value_col).cast("double")) < F.lit(MEASURABLE_MAX))
    )
    base = events.select(
        F.col(user_col).alias("entity"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        epoch.alias("_ep"),
        cents.alias("_cents"),
    )
    flagged = base.select(
        "entity",
        "_ts",
        "_id",
        "_ep",
        "_cents",
        F.when(
            F.lag("_ep").over(w).isNull()
            | ((F.col("_ep") - F.lag("_ep").over(w)) > gap_seconds),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    with_session = flagged.select(
        "entity",
        "_ts",
        "_id",
        "_ep",
        "_cents",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("session_idx"),
    )
    w_sess = Window.partitionBy("entity", "session_idx").orderBy("_ts", "_id")
    return with_session.select(
        "entity",
        # the id is an opaque passthrough — no cast (a long source stays
        # long; a UUID id must not be nulled/ANSI-crashed by a cast)
        F.col("_id").alias("event_id"),
        F.col("_ep").alias("epoch_s"),
        "session_idx",
        F.sum("_cents")
        .over(w_sess.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("running_cents"),
    )
