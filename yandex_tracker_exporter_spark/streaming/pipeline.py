"""Structured Streaming pipeline (SURVEY §2.8, ST1-ST7).

The reference hand-rolls micro-batch streaming: an APScheduler loop
(``main.py:138-147``) re-runs the batch ETL every 30 minutes against an
incrementally-advancing watermark, with latest-wins dedup absorbing the
overlap. The Spark-native equivalents:

- trigger cadence (ST1)      → ``trigger(processingTime=...)``;
  ``--run-once``             → ``Trigger.AvailableNow``
- watermark state (ST2)      → the checkpoint directory (offsets commit
  after each batch's sink write — the same commit-after-write contract)
- late/out-of-order (ST4)    → ``withWatermark`` on event time for
  streaming aggs; upsert repairs history in the batch path
- stateful aggs (ST5/ST6)    → windowed aggregation here; full A1
  sessionization stays a batch recompute per the reference's own model
  (every reappearance recomputes from the full changelog)
- exactly-once-ish (ST7)     → checkpoint + idempotent latest-version
  upsert in ``foreachBatch``

``run_micro_batch_upsert`` is the whole reference scheduler loop in one
call: stream from a directory of event files, upsert each micro-batch
into a versioned parquet table, stop at AvailableNow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of event files (the harness
    ``events`` table written incrementally stands in for the API feed)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def read_tracker_stream(
    spark: SparkSession,
    total: int = 1000,
    page_size: int = 100,
    batch_minutes: int = 30,
    parallel: bool = False,
) -> DataFrame:
    """The reference's incremental-export source AS a stream: register
    the Tracker DataSource and open ``readStream.format("tracker_api")``
    over it. The ``updated_at`` watermark the reference persists to its
    state store (``etl.py:80-89``) IS the stream offset here — Spark's
    checkpoint replaces the JSON/S3/Redis watermark file, and
    ``batch_minutes`` is the reference scheduler's cadence
    (``main.py:138-147``, 30 minutes) expressed as offset-range width
    instead of wall-clock sleeps. ``parallel=True`` fans each
    micro-batch's page list out across executors (the reference fetches
    pages sequentially on one thread).

    Compose with :func:`run_micro_batch_upsert` for the whole reference
    loop — API scan → micro-batch → latest-wins upsert table — through
    the custom source instead of the parquet stand-in;
    ``tests/test_tracker_api_source.py`` pins that composition against
    the batch scan + O1 dedup view.
    """
    from yandex_tracker_exporter_spark.sources.tracker_api import register

    register(spark)
    reader = (
        spark.readStream.format("tracker_api")
        .option("total", str(total))
        .option("page_size", str(page_size))
        .option("batch_minutes", str(batch_minutes))
    )
    if parallel:
        reader = reader.option("parallel_stream", "true")
    return reader.load()


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts (ST4/ST6): the streaming
    aggregate shape the reference approximates with its 30-minute
    re-scan + dedup."""
    return (
        stream.withWatermark(ts_col, late_threshold)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def run_micro_batch_upsert(
    stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    keys: list[str],
    available_now: bool = True,
    processing_time: str = "30 minutes",
    on_batch_complete=None,
):
    """ST1+ST7: foreachBatch latest-version upsert with checkpointing.

    Returns the StreamingQuery handle (already terminated in the
    ``available_now`` path) so callers can stop, await, or surface
    failures of a processing-time query instead of losing the only
    reference to it.

    Each micro-batch appends rows stamped with a batch version; readers
    use the O1 dedup view — identical contract to the reference's
    ReplacingMergeTree upsert, but the offsets log replaces the JSON
    watermark file.

    ``on_batch_complete(batch_id)`` (optional) runs after a batch's
    sink write but BEFORE the engine commits the batch's offsets — the
    per-batch counter hook (the reference posts run counters after
    every sync, ``etl.py:229-259``). Because it precedes the commit,
    an exception here (or a crash anywhere in the batch) leaves the
    batch uncommitted: on restart Spark replays the SAME batch id over
    the SAME input slice, the replayed append writes byte-identical
    (key, version=batch_id) rows next to the originals, and the O1
    latest-version dedup view absorbs the duplicates — this
    write-then-commit + idempotent-read contract is the exactly-once
    story, and ``tests/test_stateful_streaming.py`` pins it by
    injecting a mid-run failure and oracle-checking the restarted
    table against a no-failure run.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("version", F.lit(batch_id))
            .sortWithinPartitions(*keys)
            .write.mode("append")
            .parquet(output_path)
        )
        if on_batch_complete is not None:
            on_batch_complete(batch_id)

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.trigger(processingTime=processing_time).start()


def stream_corpus_dedup(
    stream: DataFrame,
    content_col: str = "text",
    ts_col: str = "event_time",
    late_threshold: str = "10 minutes",
    min_tokens: int = 0,
) -> DataFrame:
    """Streaming ingestion dedup for a document feed (the training-data
    counterpart of ST4/ST7): exact content dedup ACROSS micro-batches
    with bounded state.

    ``dropDuplicatesWithinWatermark`` on the content hash keeps one row
    per distinct content while the engine is allowed to expire dedup
    state once the watermark passes — the streaming-native form of
    ``exact_dedup`` (a plain ``dropDuplicates`` on an unbounded stream
    grows state forever; at 100 TB/day that is the difference between a
    working pipeline and an OOM). An optional token-count gate runs
    map-side before any state is touched.

    Emits the surviving rows with their content hash (append mode).
    """
    out = stream.withColumn("content_md5", F.md5(F.col(content_col)))
    if min_tokens > 0:
        out = out.where(
            F.size(F.split(F.trim(F.col(content_col)), r"\s+")) >= min_tokens
        )
    return out.withWatermark(ts_col, late_threshold).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )
