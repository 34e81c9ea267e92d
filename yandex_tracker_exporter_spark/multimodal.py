"""Multimodal column handling (images/audio/video as opaque binary).

Beyond-reference module for the 100 TB training-data pipeline: media
travels as ``binary`` columns with typed metadata; decode / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the JVM
never materializes decoded frames and each Python worker processes one
Arrow batch at a time (bounded memory regardless of file count).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubbed: ``decode=fake`` produces deterministic
metadata-derived features (real Spark plumbing — schema, batching,
partitioning — is exercised end-to-end); ``decode=real`` raises
``NotImplementedError`` at the clearly-marked hook where the codec call
belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Media record: opaque payload + typed metadata (the at-rest layout;
#: at 100 TB the payload column dominates, so scans must prune it —
#: metadata-only queries never touch the bytes).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_sha256", StringType(), True),
        StructField("feature_dim", IntegerType(), True),
        StructField("feature_checksum", LongType(), True),
    ]
)


def _decode_batch_fake(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the codec stage: features derived from
    the payload hash, so tests are reproducible without media libs."""
    payloads = pdf["payload"]
    sha = payloads.map(
        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
    )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "payload_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
            "payload_sha256": sha,
            "feature_dim": 64,
            "feature_checksum": sha.map(
                lambda h: int(h[:15], 16) if h is not None else 0
            ),
        }
    )


def extract_media_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    ``decode="real"`` is the marked integration point for PIL/ffmpeg —
    unavailable in this environment, so it raises.
    """
    if decode == "real":

        def real_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "media codecs (PIL/ffmpeg) are not installed in this "
                "environment; plug the decoder in here"
            )

        kernel = real_kernel
    else:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _decode_batch_fake(pdf)

    # Column pruning matters here: select only what the kernel needs so
    # the scan never reads un-needed metadata columns alongside payloads.
    pruned = df.select("media_id", "kind", "payload")
    return pruned.mapInPandas(kernel, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_sha256", StringType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decode: str = "fake"
) -> DataFrame:
    """Frame-sample video payloads: one output row per sampled frame
    (1→N row explosion inside mapInPandas — the batch shape a real
    ffmpeg kernel needs).

    The fake kernel derives deterministic per-frame hashes from
    (payload sha, frame index); ``decode="real"`` is the marked ffmpeg
    integration point.
    """
    if decode == "real":

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "ffmpeg is not installed in this environment; plug the "
                "frame decoder in here"
            )

    else:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # vectorized 1->N explosion: per-row frame counts -> repeat
            # media ids -> per-frame indices from cumulative offsets.
            # (Only the sha256 calls stay per-element: hashing is the
            # "decode" stand-in and is per-file in a real kernel anyway.)
            import numpy as np

            for pdf in batches:
                ok = pdf["payload"].notna() & pdf["duration_ms"].notna()
                pdf = pdf[ok]
                if pdf.empty:
                    yield pd.DataFrame(
                        columns=["media_id", "frame_idx", "frame_ts_ms", "frame_sha256"]
                    )
                    continue
                # clip: a negative duration yields 0 frames (the row is
                # skipped), matching the per-row `range(n)` semantics —
                # np.repeat raises on negative counts otherwise
                n_frames = (
                    (pdf["duration_ms"] // every_ms).astype("int64") + 1
                ).clip(lower=0)
                media_id = np.repeat(pdf["media_id"].to_numpy(), n_frames.to_numpy())
                ends = n_frames.to_numpy().cumsum()
                frame_idx = np.arange(ends[-1]) - np.repeat(
                    ends - n_frames.to_numpy(), n_frames.to_numpy()
                )
                base = pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest())
                base_rep = np.repeat(base.to_numpy(), n_frames.to_numpy())
                sha = [
                    hashlib.sha256(f"{b}:{i}".encode()).hexdigest()
                    for b, i in zip(base_rep, frame_idx)
                ]
                yield pd.DataFrame(
                    {
                        "media_id": media_id,
                        "frame_idx": frame_idx.astype("int32"),
                        "frame_ts_ms": frame_idx * every_ms,
                        "frame_sha256": sha,
                    }
                )

    pruned = df.where(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    )
    return pruned.mapInPandas(kernel, FRAME_SCHEMA)


def metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must not read the payload column (check
    ``.explain`` ReadSchema excludes ``payload``)."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.avg("duration_ms").alias("avg_duration_ms"),
        F.max("width").alias("max_width"),
    )
