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


def test_streaming_upsert_state_batch_order_independent(spark, tmp_path):
    """The streaming_upsert_state contract query's core claim: the
    final table state is identical whether the file source slices the
    feed into many micro-batches or swallows it in one, because
    latest-wins resolves on the data-level updated_seq, never on the
    batch id. Run the same staged feed both ways and compare the
    deduped relations row-for-row."""
    src = load_table(spark, SF_DIR, "events").limit(200)
    base = src.select(
        "event_id", "ts", "user_id", "event_type", "value",
        F.lit(0).alias("updated_seq"),
    )
    updates = src.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "event_type",
        (F.col("value") * 2).alias("value"),
        F.lit(1).alias("updated_seq"),
    )
    incoming = str(tmp_path / "in")
    base.repartition(4).write.mode("overwrite").parquet(incoming)
    updates.coalesce(1).write.mode("append").parquet(incoming)
    schema = spark.read.parquet(incoming).schema

    finals = []
    for label, mfpt in (("sliced", 1), ("single", None)):
        out = str(tmp_path / f"out_{label}")
        ckpt = str(tmp_path / f"ckpt_{label}")
        stream = read_event_stream(
            spark, incoming, schema, max_files_per_trigger=mfpt
        )
        run_micro_batch_upsert(stream, out, ckpt, keys=["event_id"])
        final = latest_version_dedup(
            spark.read.parquet(out), ["event_id"],
            version_col="updated_seq", tiebreak_col="version",
        ).select("event_id", "event_type", "value", "updated_seq")
        finals.append(sorted(tuple(r) for r in final.collect()))
    assert finals[0] == finals[1]
    assert finals[0], "feed must not be empty"


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


def test_stream_corpus_dedup_across_batches(spark, tmp_path):
    """Streaming exact dedup: duplicate content arriving in LATER
    micro-batches (within the watermark) is dropped; distinct content
    passes; the quality gate filters map-side. State is bounded by the
    watermark (dropDuplicatesWithinWatermark, not dropDuplicates)."""
    import datetime as dt
    import time as time_mod

    from pyspark.sql import functions as F

    from yandex_tracker_exporter_spark.streaming.pipeline import (
        stream_corpus_dedup,
    )

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt_dedup")
    schema = "doc_id long, text string, event_time timestamp"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    batch1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", t0),
            (2, "unique second document here", t0),
            (3, "tiny", t0),  # gated out by min_tokens
        ],
        schema,
    )
    batch1.write.parquet(src)

    stream = spark.readStream.schema(batch1.schema).option(
        "maxFilesPerTrigger", 100
    ).parquet(src)
    deduped = stream_corpus_dedup(stream, min_tokens=2)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # second wave: one exact duplicate of doc 1, one new doc
    spark.createDataFrame(
        [
            (10, "alpha beta gamma delta", t0 + dt.timedelta(minutes=1)),
            (11, "a genuinely new third document", t0 + dt.timedelta(minutes=1)),
        ],
        schema,
    ).write.mode("append").parquet(src)
    q2 = (
        stream_corpus_dedup(
            spark.readStream.schema(batch1.schema).parquet(src), min_tokens=2
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = spark.read.parquet(out)
    ids = sorted(r.doc_id for r in got.collect())
    assert 3 not in ids  # quality gate
    assert 11 in ids and 1 in ids and 2 in ids
    # the duplicate content arrived in a later batch but within the
    # watermark -> exactly one of {1, 10} survives
    texts = [r.text for r in got.collect()]
    assert texts.count("alpha beta gamma delta") == 1


def test_map_only_pipeline_ops_run_on_streams(spark, tmp_path):
    """The map-only training-pipeline operators (repetition signals,
    hash sampling, mixture resampling) must run UNCHANGED on a
    streaming DataFrame — no shuffle/state means Structured Streaming
    accepts them as stateless transforms, so the incremental ingestion
    path gets them for free. Results must equal the batch run."""
    from yandex_tracker_exporter_spark.operators.text_analysis import (
        hash_sample,
        repetition_signals,
        stratified_sample,
    )

    src = str(tmp_path / "stream_src")
    batch = spark.createDataFrame(
        [(i, f"tok{i % 3} tok{i % 3} other word", ["en", "de"][i % 2])
         for i in range(40)],
        "doc_id long, text string, lang string",
    )
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    for op, kwargs in (
        (repetition_signals, {}),
        (hash_sample, {"buckets": 10, "keep": 5}),
        (stratified_sample, {"group_col": "lang", "rates": {"de": 2.0}}),
    ):
        if op is repetition_signals:
            out_stream = op(stream)
            out_batch = op(batch)
        elif op is hash_sample:
            out_stream = op(stream, **kwargs)
            out_batch = op(batch, **kwargs)
        else:
            out_stream = op(stream, kwargs["group_col"], kwargs["rates"])
            out_batch = op(batch, kwargs["group_col"], kwargs["rates"])
        name = f"mem_{op.__name__}"
        q = (
            out_stream.writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
        want = {tuple(r) for r in out_batch.collect()}
        assert got == want, op.__name__


def test_streaming_upsert_query_invocations_are_isolated(spark):
    """Two invocations of the streaming_upsert_state contract query must
    not share workdirs: the first run's returned relation stays
    collectable AFTER the second run starts (driver ADVICE r5 — the old
    shared md5(sf_dir) workdir was rmtree'd at query start, so a later
    invocation could wipe files an earlier relation still read)."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["streaming_upsert_state"]
    first = q(spark, SF_DIR)
    second = q(spark, SF_DIR)  # would wipe first's files under the old scheme
    rows_first = sorted(tuple(r) for r in first.collect())
    rows_second = sorted(tuple(r) for r in second.collect())
    assert rows_first == rows_second
    assert rows_first, "upserted state must not be empty"
