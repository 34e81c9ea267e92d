"""Custom stateful streaming operator via ``applyInPandasWithState``.

ST5/ST6 beyond the reference: the reference recomputes per-issue metrics
from the full changelog every time an issue reappears (``issue.py:
242-258``) — correct but O(history) per update. This operator maintains
**incremental per-entity session state** across micro-batches instead:
for each entity it tracks the open session (start, last event time,
event count) and emits a row per CLOSED session (gap exceeded), so
arbitrarily long histories never get re-read.

State is a single tuple per entity (bounded memory), batches arrive as
Arrow-backed pandas frames (vectorized), and the state store rides the
streaming checkpoint — restart-safe like every other offset.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

#: (session_start_us, last_ts_us, n_events)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_US = 1_000_000


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int = 1800,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events (sorted by ts) into the open-session
    state; yield one output row per session that closes."""
    gap_us = gap_seconds * _US

    if state.exists:
        session_start_us, last_ts_us, n_events = state.get
    else:
        session_start_us = last_ts_us = None
        n_events = 0

    closed: list[tuple] = []
    # Drain EVERY chunk before sorting: a >maxRecordsPerBatch group
    # arrives as multiple pdfs in arbitrary order, and a chunk-local
    # sort would fold later-arriving earlier events after later ones —
    # rewinding last_ts_us backwards and closing sessions at phantom
    # gaps. The group's batch events must be one globally-sorted pass.
    all_ts: list = []
    for pdf in pdfs:
        # normalize to ns explicitly: pandas may deliver datetime64[us]
        # (Arrow-backed paths), where a bare int64 view would be µs and
        # the //1000 below would silently shrink gaps 1000×.
        # dropna FIRST: a NaT casts to the INT64_MIN sentinel, sorts
        # ahead of every real event, seeds the open session, and the
        # next real event "closes" a phantom session whose year-1677
        # timestamp CRASHES pd.to_datetime below — one junk row killed
        # the whole streaming query (and would corrupt the entity's
        # state even if it didn't). An event with no timestamp cannot
        # participate (the sessionize F8 / funnel posture); the
        # operator also filters plan-side, this is the kernel's own
        # guard for direct callers.
        ts = pdf["ts"].dropna()
        ts_us = ts.astype("datetime64[ns]").astype("int64") // 1000  # ns → µs
        all_ts.extend(ts_us)
    for t in sorted(all_ts):
        if last_ts_us is None:
            session_start_us, last_ts_us, n_events = t, t, 1
        elif t - last_ts_us > gap_us:
            closed.append((key[0], session_start_us, last_ts_us, n_events))
            session_start_us, last_ts_us, n_events = t, t, 1
        else:
            last_ts_us = t
            n_events += 1

    state.update((session_start_us, last_ts_us, n_events))

    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out


def stateful_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Incremental gap-based sessionization over a stream.

    Each entity's state is one open-session tuple; closed sessions are
    emitted as they complete. Works on batch DataFrames too (one "batch"
    = one epoch), which the tests exploit for equivalence checks.
    """

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_seconds)

    renamed = stream.selectExpr(f"{user_col} as user_id", f"{ts_col} as ts")
    # An event with no entity key or no timestamp cannot be sessionized
    # (the sessionize F8 corrupt-event posture): a NULL user_id would
    # otherwise form its OWN state group (junk sessions under a NULL
    # entity, state held forever), and a NULL ts would reach the kernel
    # as a NaT whose INT64_MIN cast crashes the query (see
    # _sessionize_group). Plan-side filter so the scan prunes them.
    renamed = renamed.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return renamed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
