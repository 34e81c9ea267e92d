"""Round-9 operator-surface review, part 3: latent-input shapes
through the STREAMING stateful family.

Bug class found and fixed (the worst severity of the probe series —
not silent corruption but a QUERY-KILLING crash): a single NaT
timestamp reaching ``_sessionize_group`` cast to the INT64_MIN
sentinel, sorted ahead of every real event, seeded the open session,
and the next real event "closed" a phantom session whose year-1677
timestamp raised ``OutOfBoundsDatetime`` inside ``pd.to_datetime`` —
one junk row killed the whole streaming query, and had it survived,
the entity's state would have been corrupted (phantom session emitted,
real session start rewound).

Fix posture = sessionize F8 / funnel: an event with no timestamp or
no entity key cannot participate. Applied twice: a plan-side filter in
``stateful_sessionize`` (pushable to the scan; also stops a NULL
user_id from forming its own state group held forever) and a kernel
``dropna`` for direct callers of ``_sessionize_group``.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.streaming.stateful import (
    _sessionize_group,
    stateful_sessionize,
)


class FakeState:
    def __init__(self, value=None):
        self.exists = value is not None
        self.value = value

    @property
    def get(self):
        return self.value

    def update(self, v):
        self.value = v


def _fold(chunks, state, gap=1800):
    return list(_sessionize_group((1,), iter(chunks), state, gap))


def test_kernel_nat_event_cannot_participate():
    # NaT amid real events: used to crash with OutOfBoundsDatetime
    dirty = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-01 10:00:00", None, "2024-01-01 10:10:00",
         "2024-01-01 12:00:00"])})
    clean = dirty.dropna()
    s_dirty, s_clean = FakeState(), FakeState()
    out_dirty = _fold([dirty], s_dirty)
    out_clean = _fold([clean], s_clean)
    assert len(out_dirty) == len(out_clean) == 1
    pd.testing.assert_frame_equal(out_dirty[0], out_clean[0])
    assert s_dirty.value == s_clean.value
    # the one closed session is the real one, not a phantom
    row = out_dirty[0].iloc[0]
    assert row["session_start"] == pd.Timestamp("2024-01-01 10:00:00")
    assert row["n_events"] == 2


def test_kernel_all_nat_batch_is_a_noop():
    all_nat = pd.DataFrame({"ts": pd.to_datetime([None, None])})
    # no prior state: "no open session" persisted, nothing emitted
    s = FakeState()
    assert _fold([all_nat], s) == []
    assert s.value == (None, None, 0)
    # existing open session: untouched, nothing emitted
    prior = (1704100000000000, 1704100600000000, 3)
    s2 = FakeState(prior)
    assert _fold([all_nat], s2) == []
    assert s2.value == prior


@pytest.mark.parametrize("junk", [
    (None, "2024-01-01 10:05:00"),  # null entity key
    (1, None),                       # null timestamp
    (None, None),
])
def test_stream_junk_rows_do_not_move_real_sessions(spark, tmp_path, junk):
    """End-to-end: a streaming query over a feed containing junk rows
    emits exactly the clean feed's sessions (and does not crash)."""
    import datetime as dt

    T = dt.datetime.fromisoformat
    clean_rows = [
        (1, T("2024-01-01 10:00:00")),
        (1, T("2024-01-01 10:10:00")),
        (1, T("2024-01-01 12:00:00")),  # >30min gap closes session 1
    ]
    junk_row = (junk[0], T(junk[1]) if junk[1] else None)
    df = spark.createDataFrame(
        clean_rows + [junk_row], "user_id long, ts timestamp"
    )
    path = str(tmp_path / "in")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    name = f"latent_sessions_{abs(hash(junk))}"
    q = (
        stateful_sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [tuple(r) for r in spark.table(name).collect()]
    assert got == [
        (1, T("2024-01-01 10:00:00"), T("2024-01-01 10:10:00"), 2)
    ]


def test_windowed_counts_junk_stays_confined(spark):
    """Pin: windowed_event_counts on a feed with a null-ts event — the
    junk forms its own NULL-window row (batch semantics) and real
    windows are unchanged. (In a watermarked streaming run Spark drops
    null event times before the stateful agg.)"""
    import datetime as dt

    from yandex_tracker_exporter_spark.streaming.pipeline import (
        windowed_event_counts,
    )

    T = dt.datetime.fromisoformat
    rows = [
        ("view", T("2024-01-01 10:05:00"), 1.0),
        ("view", T("2024-01-01 10:25:00"), 2.0),
        ("view", None, 99.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = windowed_event_counts(df)
    real = out.where(F.col("window_start").isNotNull()).collect()
    assert [tuple(r) for r in real] == [
        (T("2024-01-01 10:00:00"), T("2024-01-01 11:00:00"), "view", 2, 3.0)
    ]
