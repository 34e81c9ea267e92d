"""Structured Streaming pipeline tests (ST1-ST7)."""

import os

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.dedup import latest_version_dedup
from yandex_tracker_exporter_spark.sources.tables import load_table
from yandex_tracker_exporter_spark.streaming import (
    read_event_stream,
    run_micro_batch_upsert,
    windowed_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _stage_event_files(spark, tmp_path, n_parts=3):
    """Write the events table as several TIME-SLICED files — each becomes
    a micro-batch with maxFilesPerTrigger=1.

    Slices are written SEQUENTIALLY (distinct mtimes) because the file
    source orders batches by modification time: time-sliced-but-
    simultaneous files can be consumed out of order, making whole slices
    late-beyond-watermark (correct drop semantics, but not what this
    test measures)."""
    import time

    src = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "incoming")
    bounds = src.approxQuantile("event_id", [i / n_parts for i in range(1, n_parts)], 0)
    lo = None
    for hi in [*bounds, None]:
        cond = F.lit(True) if lo is None else F.col("event_id") >= lo
        if hi is not None:
            cond = cond & (F.col("event_id") < hi)
        # event_id order ≈ ts order in the harness data; use ts bounds on
        # the slice to keep the time ordering exact
        src.where(cond).coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)
        lo = hi
    return path, src.schema, src.count()


def test_micro_batch_upsert_availablenow(spark, tmp_path):
    incoming, schema, n_events = _stage_event_files(spark, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = read_event_stream(spark, incoming, schema, max_files_per_trigger=1)
    assert stream.isStreaming
    run_micro_batch_upsert(stream, out, ckpt, keys=["user_id", "event_type"])

    written = spark.read.parquet(out)
    assert written.count() == n_events
    assert "version" in written.columns

    # ST7 idempotency: re-running with the same checkpoint consumes no
    # new offsets and writes nothing new
    stream2 = read_event_stream(spark, incoming, schema, max_files_per_trigger=1)
    run_micro_batch_upsert(stream2, out, ckpt, keys=["user_id", "event_type"])
    assert spark.read.parquet(out).count() == n_events

    # O1 read view: latest version per key
    latest = latest_version_dedup(
        spark.read.parquet(out), ["user_id", "event_type"], "version"
    )
    expected = (
        spark.read.parquet(out).select("user_id", "event_type").distinct().count()
    )
    assert latest.count() == expected


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    incoming, schema, _ = _stage_event_files(spark, tmp_path)
    stream = read_event_stream(spark, incoming, schema, max_files_per_trigger=1)
    windowed = windowed_event_counts(stream, window="1 hour", late_threshold="2 hours")

    query = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    got = spark.table("win_counts")

    batch = windowed_event_counts(
        load_table(spark, SF_DIR, "events"), window="1 hour", late_threshold="2 hours"
    )
    # the watermark may hold back the final (open) window in streaming
    # mode; every emitted row must match the batch result exactly
    batch_rows = {tuple(r) for r in batch.collect()}
    got_rows = {tuple(r) for r in got.collect()}
    assert got_rows <= batch_rows
    assert len(got_rows) >= len(batch_rows) - 5 * 2  # ≤2 open windows/type held back
