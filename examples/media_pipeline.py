"""End-to-end multimodal pipeline over opaque binary media columns:
metadata triage (payload-pruned) → real decode (WAV / PPM / PNG / Y4M)
→ per-modality feature extraction (audio frame energy, image channel
histograms) → nearest-neighbor resize → quarantine accounting.

Every media op is an Arrow-batched ``mapInPandas`` stage over pruned
(media_id, payload) scans — the JVM never materializes decoded frames,
corrupt payloads quarantine to skipped/null rows instead of failing the
job, and at 100 TB each Python worker holds one Arrow batch at a time.

Run: ``python examples/media_pipeline.py [sf_dir]`` (default
``/root/testdata/sf0.001``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark import get_spark
from yandex_tracker_exporter_spark.multimodal import (
    audio_frame_energy,
    decode_media,
    image_channel_histogram,
    media_fixture_from_documents,
    png_fixture_from_documents,
    resize_images,
)
from yandex_tracker_exporter_spark.sources.tables import load_table


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="media-pipeline", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # 1. a mixed-modality corpus: WAV audio + PPM images from the text
    #    fixture, plus the same raster family round-tripped through the
    #    COMPRESSED codec (PNG: DEFLATE + scanline filters)
    media = media_fixture_from_documents(docs)
    png_media = png_fixture_from_documents(docs)

    # 2. real decode once, then per-format header triage (metadata_stats
    #    itself is for metadata-bearing tables — its payload-pruned scan
    #    is plan-asserted in the contract; here we summarize the decoded
    #    headers instead)
    decoded = decode_media(media).cache()
    stats = decoded.groupBy("format").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("width").alias("max_w"),
        F.max("duration_ms").alias("max_ms"),
    )
    print("per-format decode summary:",
          sorted(tuple(r) for r in stats.collect()))

    # 3. per-modality features over the REAL decoders
    energy = audio_frame_energy(media)
    hist = image_channel_histogram(media.unionByName(png_media))
    print("audio frames:", energy.count(),
          "| histogram cells:", hist.count())

    # 4. normalize every image (PPM and PNG alike) to 2x2 thumbnails —
    #    byte-deterministic nearest-neighbor, re-encoded as PPM
    thumbs = resize_images(media.unionByName(png_media), 2, 2)
    print("thumbnails:", thumbs.count(),
          "| distinct contents:",
          thumbs.select("content_checksum").distinct().count())

    # 5. quarantine accounting: fixture rows whose payload failed decode
    n_media = media.count()
    n_decoded = decoded.where(F.col("format").isNotNull()).count()
    print(f"decoded {n_decoded}/{n_media} payloads "
          "(the gap is the corrupt-row quarantine)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
