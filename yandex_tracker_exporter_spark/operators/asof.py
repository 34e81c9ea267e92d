"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Joins each left-side event to the latest right-side version at or before
the event's timestamp. The reference never joins explicitly (SURVEY
§2.5), but its interval-reconstruction fallback for A1 is exactly this
shape; at 100 TB the pattern appears whenever events must see
dimension-as-of-event-time (issue state at changelog time, price at
order time).

Implementation is the scalable **union + ordered window** trick, NOT a
range join:

1. tag right rows (time = version ts, payload) and left rows (time =
   event ts) into one relation;
2. one shuffle+sort per key: ``last(payload, ignoreNulls) over
   (partitionBy(key).orderBy(time, side))`` carries the most recent
   right payload forward onto every left row;
3. keep the left rows.

Cost: a single hash shuffle + in-partition sort of |L|+|R| — linear, no
key×key blowup, AQE-skew-splittable. A broadcast range join would be
quadratic per key; a per-key ``applyInPandas`` would serialize.

Ties: a right row AT the event timestamp is visible (``<=`` semantics)
because right sorts before left at equal time; equal right timestamps
per key must be pre-deduplicated by the caller (latest-version dedup) —
the operator asserts nothing about them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Return ``left`` with, for each row, the most recent ``right``
    payload at or before ``left_ts`` (nulls when none exists).

    ``payload_cols`` defaults to every right column except key/ts.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, right_ts)]

    # Corrupt-record guard (round 9, the funnel `_timed` posture): a
    # right row with a NULL timestamp sorts FIRST in the carry window,
    # so its payload used to become the "most recent at or before"
    # match for every left row EARLIER than the first real right row —
    # rows that should get NULL got the junk payload. A NULL-key right
    # row is dropped for join-semantics consistency: an equi-join never
    # matches NULL keys, so the window formulation must not either
    # (left rows keep standard left-join behavior: present, NULL
    # payload when nothing matches).
    right = right.where(F.col(right_ts).isNotNull() & F.col(key).isNotNull())

    payload = F.struct(*[F.col(c) for c in payload_cols])
    right_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}") for t in left.schema.fields],
    )
    left_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right_tagged.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    unioned = right_tagged.unionByName(left_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)

    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols += [F.col("_asof")[c].alias(c) for c in payload_cols]
    return carried.select(*out_cols)
