"""Custom Tracker-API DataSource tests (S1 + source-level pushdown)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.sources.tracker_api import (
    FakeTrackerBackend,
    SearchQuery,
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _read(spark, **options):
    reader = spark.read.format("tracker_api")
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


def test_full_scan_pagination(spark):
    df = _read(spark, total=250, page_size=100)
    assert df.count() == 250
    # one partition per page
    assert df.rdd.getNumPartitions() == 3


def test_queue_filter_pushed_to_source(spark):
    df = _read(spark, total=400, page_size=50).where(F.col("queue") == "DEV")
    rows = df.collect()
    backend = FakeTrackerBackend(400, 50)
    assert len(rows) == backend.count(SearchQuery(queues=["DEV"]))
    assert all(r["queue"] == "DEV" for r in rows)
    # pushdown shrank the scan itself: partitions follow the FILTERED
    # count (2 pages of ≤50 from 100 DEV issues, not 8 pages of 400)
    assert df.rdd.getNumPartitions() == 2


def test_watermark_filter_pushed_to_source(spark):
    wm = dt.datetime(2024, 1, 1, 5, 0)  # issues are minute-spaced
    df = _read(spark, total=400, page_size=100).where(F.col("updated_at") >= wm)
    assert df.count() == 400 - 300  # first 300 minutes filtered out
    assert df.rdd.getNumPartitions() == 1


def test_combined_incremental_scan(spark):
    """The reference's stateful search: queue + watermark, both remote."""
    wm = dt.datetime(2024, 1, 1, 2, 0)
    df = _read(spark, total=600, page_size=100).where(
        F.col("queue").isin("DEV", "SRE") & (F.col("updated_at") > wm)
    )
    backend = FakeTrackerBackend(600, 100)
    expected = backend.count(
        SearchQuery(queues=["DEV", "SRE"], updated_from=wm, strict_from=True)
    )
    assert df.count() == expected
    got = df.agg(F.min("updated_at").alias("m")).first()["m"]
    assert got > wm


def test_unsupported_filter_stays_in_spark(spark):
    # status filter is not pushable — Spark must still apply it
    df = _read(spark, total=100, page_size=100).where(F.col("status") == "open")
    rows = df.collect()
    assert rows and all(r["status"] == "open" for r in rows)


def test_rate_limited_reader_paces_per_slot(spark):
    """requests_per_second paces each deserialized reader instance: one
    slot serving 4 pages at 4 rps spaces them 0.25s apart (≥ 0.75s
    total), while a fresh instance's FIRST page never sleeps — the old
    global page-index schedule made a late task serving page N sleep
    N/rps from its own start (O(pages²/rps) scans). Results match an
    unthrottled scan."""
    import time

    from yandex_tracker_exporter_spark.sources.tracker_api import (
        TrackerApiDataSource,
    )

    opts = {"total": "400", "page_size": "100", "requests_per_second": "4"}
    source = TrackerApiDataSource(opts)
    reader = source.reader(source.schema())
    parts = reader.partitions()
    assert len(parts) == 4
    t0 = time.time()
    rows = [r for p in parts for r in reader.read(p)]  # one slot, 4 pages
    elapsed = time.time() - t0
    assert len(rows) == 400
    assert elapsed >= 0.75
    # a fresh instance (new task) starts its own schedule: page 3 alone
    # must NOT inherit a 3/rps backlog sleep
    reader2 = source.reader(source.schema())
    t0 = time.time()
    assert list(reader2.read(parts[3]))
    assert time.time() - t0 < 0.5
    # end-to-end through Spark still returns the same rows
    fast = _read(spark, total=400, page_size=100).collect()
    throttled = _read(
        spark, total=400, page_size=100, requests_per_second=4
    ).collect()
    assert sorted(throttled) == sorted(fast)


def test_comments_entity_scan(spark):
    """S4: the comments table of the same source."""
    df = _read(spark, entity="comments", total=100, page_size=50)
    backend = FakeTrackerBackend(100, 50)
    expected = backend.count_comments(None)
    rows = df.collect()
    assert len(rows) == expected > 0
    # schema shape
    assert df.columns == ["issue_key", "comment_id", "author", "text", "created_at"]
    # deterministic payloads: issue 5 (queue SRE-5, 5%4=1 comment)
    by_issue = {}
    for r in rows:
        by_issue.setdefault(r["issue_key"], []).append(r)
    assert len(by_issue["SRE-5"]) == 1
    assert by_issue["SRE-5"][0]["text"] == "comment 0 on SRE-5"


def test_comments_issue_key_pushdown(spark):
    """issue_key predicates compile into the remote fetch: partition
    count follows the FILTERED comment count, not the corpus size."""
    df = _read(spark, entity="comments", total=400, page_size=10).where(
        F.col("issue_key").isin("DEV-4", "SRE-5", "OPS-6")
    )
    rows = df.collect()
    # 4%4=0, 5%4=1, 6%4=2 comments
    assert len(rows) == 3
    assert {r["issue_key"] for r in rows} == {"SRE-5", "OPS-6"}
    # 3 comments fit one 10-row page; an unpushed scan of 400 issues'
    # comments (~600) would need ~60 partitions
    assert df.rdd.getNumPartitions() == 1

    eq = _read(spark, entity="comments", total=400, page_size=10).where(
        F.col("issue_key") == "OPS-6"
    )
    assert eq.count() == 2
    assert eq.rdd.getNumPartitions() == 1


def test_parallel_stream_reader_fans_out_pages(spark, tmp_path):
    """parallel_stream=true: the batch's offset range fans out one
    partition per page (executor-side fetch), drains the corpus, and
    matches the batch scan row-for-row."""
    import time

    out = str(tmp_path / "pfeed")
    s = (
        spark.readStream.format("tracker_api")
        .option("total", "600")
        .option("page_size", "100")
        .option("parallel_stream", "true")
        .load()
    )
    q = (
        s.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "pckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 600
    batch = _read(spark, total=600, page_size=100)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    # fan-out actually happened: one output file per page partition
    import os

    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) >= 6


def test_streaming_source_incremental_offsets(spark, tmp_path):
    """ST2: the watermark is the stream offset; micro-batches advance it
    and the checkpoint makes restarts incremental."""
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("tracker_api")
        .option("total", "600")  # minute-spaced updates → 600 min of data
        .option("batch_minutes", "120")
        .load()
    )
    assert stream.isStreaming
    # NB: python streaming sources don't support availableNow — drive a
    # fast processingTime trigger and wait for the drain; the parquet
    # sink (unlike memory) supports checkpoint recovery
    import time

    out = str(tmp_path / "feed")

    def run_stream(seconds_budget: float, target: int | None) -> None:
        s = (
            spark.readStream.format("tracker_api")
            .option("total", "600")
            .option("batch_minutes", "120")
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        deadline = time.time() + seconds_budget
        while time.time() < deadline:
            try:
                if target is not None and spark.read.parquet(out).count() >= target:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(1)
        q.stop()
        q.awaitTermination()

    run_stream(90, 600)
    # 5 micro-batches of 120 minutes drain the 600-minute corpus
    assert spark.read.parquet(out).count() == 600

    # restart from the checkpoint: offsets resume past the corpus — no
    # reprocessing, nothing new appended
    run_stream(6, None)
    assert spark.read.parquet(out).count() == 600


def test_conjunctive_pushed_filters_intersect(spark):
    """Catalyst may push `isin(...) AND ==` unsimplified; claiming both
    while honoring only the last leaks excluded rows. Pushed queue sets
    must intersect and updated_at bounds must tighten."""
    from yandex_tracker_exporter_spark.sources.tracker_api import (
        TrackerApiReader,
        TrackerCommentsReader,
    )
    from pyspark.sql.datasource import EqualTo, GreaterThan, GreaterThanOrEqual, In

    reader = TrackerApiReader(None, {"total": "100", "page_size": "50"})
    remaining = reader.pushFilters(
        [In(("queue",), ("DEV", "OPS")), EqualTo(("queue",), "DEV")]
    )
    assert remaining == []
    assert reader.query.queues == ["DEV"]  # intersection, not last-wins

    # disjoint intersection -> impossible queue, zero rows (never "all")
    reader2 = TrackerApiReader(None, {"total": "100", "page_size": "50"})
    reader2.pushFilters([EqualTo(("queue",), "DEV"), EqualTo(("queue",), "OPS")])
    assert reader2.query.queues and "DEV" not in reader2.query.queues
    assert reader2.backend.count(reader2.query) == 0

    # updated_at: the STRONGER lower bound wins regardless of order
    t1 = dt.datetime(2024, 1, 1)
    t2 = dt.datetime(2024, 6, 1)
    reader3 = TrackerApiReader(None, {"total": "100", "page_size": "50"})
    reader3.pushFilters(
        [GreaterThan(("updated_at",), t2), GreaterThanOrEqual(("updated_at",), t1)]
    )
    assert reader3.query.updated_from == t2 and reader3.query.strict_from

    # comments: key sets intersect
    creader = TrackerCommentsReader(None, {"total": "100", "page_size": "50"})
    creader.pushFilters(
        [In(("issue_key",), ("DEV-1", "DEV-2")), EqualTo(("issue_key",), "DEV-1")]
    )
    assert creader.issue_keys == ["DEV-1"]
    creader2 = TrackerCommentsReader(None, {"total": "100", "page_size": "50"})
    creader2.pushFilters(
        [EqualTo(("issue_key",), "DEV-1"), EqualTo(("issue_key",), "DEV-2")]
    )
    assert creader2.issue_keys == []  # disjoint -> no keys, zero rows


def test_comments_disjoint_pushdown_returns_zero_rows(spark):
    """End-to-end: two contradictory key predicates -> empty result,
    not a full unfiltered comments scan."""
    df = _read(spark, entity="comments", total=50, page_size=25)
    got = df.where(
        F.col("issue_key").isin("DEV-1", "DEV-2") & (F.col("issue_key") == "TEST-3")
    )
    assert got.count() == 0


def test_reference_loop_composed_through_custom_source(spark, tmp_path):
    """The WHOLE reference scheduler loop (main.py:138-147: re-scan
    every 30 min from the persisted updated_at watermark; etl.py:80-89:
    latest-wins absorbs overlap) composed through the CUSTOM streaming
    source instead of the parquet stand-in: read_tracker_stream →
    run_micro_batch_upsert → latest_version_dedup view must equal the
    batch scan of the same backend row-for-row. (Micro-batch cadence +
    checkpoint restart of the source itself is pinned by
    test_streaming_source_incremental_offsets; this test pins the
    COMPOSITION with the upsert sink and O1 view.)"""
    from yandex_tracker_exporter_spark.operators.dedup import (
        latest_version_dedup,
    )
    from yandex_tracker_exporter_spark.streaming import (
        read_tracker_stream,
        run_micro_batch_upsert,
    )

    out = str(tmp_path / "issues_table")
    stream = read_tracker_stream(
        spark, total=500, page_size=100, parallel=True
    )
    run_micro_batch_upsert(
        stream,
        output_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
        keys=["issue_key"],
        available_now=True,
    )
    table = spark.read.parquet(out)
    view = latest_version_dedup(table, ["issue_key"]).drop("version")

    batch = _read(spark, total=500, page_size=100)
    assert sorted(map(tuple, view.collect())) == sorted(
        map(tuple, batch.collect())
    )
