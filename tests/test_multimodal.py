"""Multimodal binary-column plumbing tests (decode is stubbed; the Spark
schema/batching/pruning is real)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    metadata_stats,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-payload-1", 640, 480, None),
        (2, "image", "image/png", b"\x89PNG-fake-payload-22", 800, 600, None),
        (3, "audio", "audio/wav", b"RIFF-fake-wav", None, None, 2000),
        (4, "video", "video/mp4", None, 1920, 1080, 60000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_media_features_fake_decode(spark, media):
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert set(feats) == {1, 2, 3, 4}
    expected_sha = hashlib.sha256(b"\x89PNG-fake-payload-1").hexdigest()
    assert feats[1]["payload_sha256"] == expected_sha
    assert feats[1]["payload_bytes"] == len(b"\x89PNG-fake-payload-1")
    assert feats[1]["feature_checksum"] == int(expected_sha[:15], 16)
    assert feats[4]["payload_sha256"] is None  # null payload survives
    assert feats[4]["payload_bytes"] == 0


def test_real_decode_is_marked_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_media_features(media, decode="real").collect()


def test_metadata_stats_prunes_payload(spark, media, tmp_path):
    # column pruning must reach the scan: a metadata aggregate over the
    # parquet table must not read the payload column
    path = str(tmp_path / "media")
    media.write.parquet(path)
    stats = metadata_stats(spark.read.parquet(path))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    got = {r["kind"]: r["n_media"] for r in stats.collect()}
    assert got == {"image": 2, "audio": 1, "video": 1}


def test_frame_sampling_explodes_rows(spark, media):
    import hashlib as _hl

    from yandex_tracker_exporter_spark.multimodal import sample_frames

    # add a video WITH payload (fixture video 4 has null payload)
    extra = spark.createDataFrame(
        [(5, "video", "video/mp4", b"fake-mp4-bytes", None, None, 3500)],
        media.schema,
    )
    frames = sample_frames(media.union(extra), every_ms=1000).collect()
    # 3500ms at 1000ms sampling → frames at 0,1000,2000,3000
    assert len(frames) == 4
    assert [f["frame_ts_ms"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [
        0, 1000, 2000, 3000,
    ]
    base = _hl.sha256(b"fake-mp4-bytes").hexdigest()
    assert frames[0]["frame_sha256"] == _hl.sha256(f"{base}:0".encode()).hexdigest()


def test_frame_sampling_negative_duration_is_skipped(spark, media):
    """A negative duration_ms yields zero frames for that row (the old
    per-row `range(n)` semantics) instead of crashing the whole task
    (np.repeat raises on negative counts)."""
    from yandex_tracker_exporter_spark.multimodal import sample_frames

    extra = spark.createDataFrame(
        [
            (6, "video", "video/mp4", b"negative-duration", None, None, -1500),
            (7, "video", "video/mp4", b"ok-bytes", None, None, 1500),
        ],
        media.schema,
    )
    frames = sample_frames(media.union(extra), every_ms=1000).collect()
    assert {f["media_id"] for f in frames} == {7}
    assert len(frames) == 2  # 0ms and 1000ms
