"""applyInPandasWithState incremental sessionization (ST5/ST6 custom
stateful operator)."""

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.sources.tables import load_table
from yandex_tracker_exporter_spark.streaming.stateful import stateful_sessionize

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _batch_closed_sessions(events):
    """Gaps-and-islands reference: sessions closed by a >30min gap (the
    per-user final session stays open and must NOT be emitted)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = events.select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    # a session closes at event e when the next event is >30min away
    closes = flagged.where(
        F.col("next_ts").isNotNull()
        & (
            F.unix_timestamp(F.col("next_ts").cast("timestamp"))
            - F.unix_timestamp(F.col("ts").cast("timestamp"))
            > 1800
        )
    )
    return closes.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_closed"))


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")

    # stage as 3 sequential time slices (see test_streaming.py)
    import time

    path = str(tmp_path / "incoming")
    bounds = events.approxQuantile("event_id", [1 / 3, 2 / 3], 0)
    lo = None
    for hi in [*bounds, None]:
        cond = F.lit(True) if lo is None else F.col("event_id") >= lo
        if hi is not None:
            cond = cond & (F.col("event_id") < hi)
        events.where(cond).coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)
        lo = hi

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    sessions = stateful_sessionize(stream, gap_seconds=1800)
    query = (
        sessions.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    got = spark.table("stateful_sessions")

    expected = {
        r["user_id"]: r["n_closed"] for r in _batch_closed_sessions(events).collect()
    }
    got_counts = {
        r["user_id"]: r["n"]
        for r in got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_counts == expected

    # session integrity: per-session event counts also match the batch
    # total minus whatever is still open in state
    total_emitted = got.agg(F.sum("n_events")).collect()[0][0]
    assert total_emitted < events.count()
    # every closed session is a valid interval
    bad = got.where(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_sessionize_multi_chunk_groups_sorted_globally(spark):
    """A group larger than the Arrow batch size arrives as MULTIPLE
    pandas chunks in arbitrary order; chunk-local sorting used to rewind
    last_ts backwards and close sessions at phantom gaps. All chunks
    must fold as one globally-sorted pass — tested on _sessionize_group
    directly with out-of-order chunks and a fake GroupState."""
    import pandas as pd

    from yandex_tracker_exporter_spark.streaming.stateful import (
        _sessionize_group,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    # chunk 1: 11:00-12:00 events; chunk 2 arrives SECOND but holds the
    # EARLIER 10:00-10:30 events (the out-of-order shape)
    c1 = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-01 11:00:00", "2024-01-01 11:30:00", "2024-01-01 12:00:00"])})
    c2 = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-01 10:00:00", "2024-01-01 10:30:00", "2024-01-01 12:40:00"])})
    state = FakeState()
    closed = list(_sessionize_group(("u1",), iter([c1, c2]), state, 1800))
    # globally sorted: 10:00..12:00 is one 5-event session (every gap
    # exactly 30 min = threshold, not >), closed by the 40-min gap to
    # 12:40 which opens the new state. The old chunk-local fold closed
    # a phantom (11:00-12:00, 3 events) session instead, rewound to
    # 10:00, and left a corrupted state.
    assert len(closed) == 1
    row = closed[0].iloc[0]
    assert row["session_start"] == pd.Timestamp("2024-01-01 10:00:00")
    assert row["session_end"] == pd.Timestamp("2024-01-01 12:00:00")
    assert row["n_events"] == 5
    start_us, last_us, n = state.value
    assert n == 1
    assert pd.Timestamp(start_us, unit="us") == pd.Timestamp("2024-01-01 12:40:00")
    assert pd.Timestamp(last_us, unit="us") == pd.Timestamp("2024-01-01 12:40:00")


def test_upsert_checkpoint_restart_after_midbatch_failure(spark, tmp_path):
    """ST7 failure path (the reference's commit-after-write contract,
    etl.py:229-259): a crash AFTER a batch's sink write but BEFORE its
    offset commit must not lose or duplicate logical state. The batch
    is replayed on restart (same batch id, same input slice), the
    replay double-appends raw rows, and the latest-version dedup view
    absorbs them — the restarted table must equal a no-failure run's
    table exactly."""
    import pyspark.sql.utils as U
    from py4j.protocol import Py4JJavaError

    from yandex_tracker_exporter_spark.operators.dedup import (
        latest_version_dedup,
    )
    from yandex_tracker_exporter_spark.streaming.pipeline import (
        read_event_stream,
        run_micro_batch_upsert,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    # 4 single-file batches of upserts to two keys
    for i in range(4):
        spark.createDataFrame(
            [(i % 2, i * 10, f"f{i}")], "key long, val long, origin string"
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run(out, ckpt, hook=None):
        stream = read_event_stream(spark, src, schema, max_files_per_trigger=1)
        return run_micro_batch_upsert(
            stream, out, ckpt, keys=["key"], on_batch_complete=hook
        )

    # ---- run A: no failure ----
    out_a, ckpt_a = str(tmp_path / "out_a"), str(tmp_path / "ckpt_a")
    run(out_a, ckpt_a)
    final_a = sorted(
        (r["key"], r["val"])
        for r in latest_version_dedup(
            spark.read.parquet(out_a), ["key"]
        ).collect()
    )

    # ---- run B: crash after batch 1's write, before its commit ----
    out_b, ckpt_b = str(tmp_path / "out_b"), str(tmp_path / "ckpt_b")

    def bomb(batch_id):
        if batch_id == 1:
            raise RuntimeError("injected crash between write and commit")

    import pytest

    with pytest.raises(Exception, match="injected crash"):
        run(out_b, ckpt_b, hook=bomb)
    # batch 1's rows ARE on disk (write preceded the crash)...
    mid_rows = spark.read.parquet(out_b).count()
    assert mid_rows == 2  # batches 0 and 1 written, 2,3 never ran

    # ---- restart from the same checkpoint, no failure ----
    run(out_b, ckpt_b)
    raw_b = spark.read.parquet(out_b)
    # ...and the uncommitted batch was REPLAYED: its rows appear twice
    assert raw_b.count() == 5  # 4 batches + 1 replayed duplicate
    dup = raw_b.groupBy("key", "version").count().where(F.col("count") > 1)
    assert [(r["key"], r["version"]) for r in dup.collect()] == [(1, 1)]
    # the dedup view absorbs the replay: final state equals run A
    final_b = sorted(
        (r["key"], r["val"])
        for r in latest_version_dedup(raw_b, ["key"]).collect()
    )
    assert final_b == final_a
