"""Multimodal column handling (images/audio/video as opaque binary).

Beyond-reference module for the 100 TB training-data pipeline: media
travels as ``binary`` columns with typed metadata; decode / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the JVM
never materializes decoded frames and each Python worker processes one
Arrow batch at a time (bounded memory regardless of file count).

Compressed codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
two decode modes exist:

- ``decode="fake"`` — deterministic metadata-derived features (the
  original stub; real Spark plumbing, fake content).
- ``decode="real"`` — pure-Python parsers for four public formats:
  **WAV** (RIFF PCM audio), **PPM** (P6 binary portable pixmap),
  **Y4M** (YUV4MPEG2 uncompressed video), and **PNG** (8-bit RGB,
  zlib DEFLATE via stdlib + all five scanline filters — a real
  COMPRESSED format decoded in-sandbox). These decode actual payload
  bytes end-to-end; a PIL/ffmpeg kernel for JPEG/MP4 plugs into the
  same dispatch table.

Unparseable payloads yield null features instead of failing the task —
the corrupt-row quarantine posture of SURVEY §2 F8, which is the only
sane behavior when scanning 100 TB of crawled media.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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


# --------------------------------------------------------------------------
# Pure-Python codecs for codec-free formats (WAV PCM / PPM P6 / Y4M).
# Encoders double as deterministic fixture builders for tests and the
# oracle-checked contract query; decoders are the ``decode="real"`` path.
# --------------------------------------------------------------------------


def _encode_wav_pcm(data: bytes, sample_rate: int, n_channels: int) -> bytes:
    """RIFF/WAVE wrapper around raw little-endian int16 PCM bytes."""
    fmt = struct.pack(
        "<IHHIIHH", 16, 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_wav(samples: list[int], sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """16-bit little-endian PCM WAV (RIFF) from int16 sample values."""
    return _encode_wav_pcm(
        struct.pack("<%dh" % len(samples), *samples), sample_rate, n_channels
    )


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM WAV: walks RIFF chunks (tolerates extra chunks such as
    LIST/INFO), returns header fields + decoded int16 samples."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    n_values = len(data) // 2
    # vectorized decode: int16 little-endian view + exact int64 sum
    # (identical to summing struct.unpack'ed Python ints, ~30× cheaper)
    samples = np.frombuffer(data[: n_values * 2], dtype="<i2")
    n_frames = n_values // max(n_channels, 1)
    return {
        "format": "wav",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "n_elements": n_values,
        "duration_ms": n_frames * 1000 // sample_rate,
        "content_checksum": int(samples.astype(np.int64).sum()),
    }


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """P6 binary portable pixmap; ``pixels`` is width*height*3 RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, raster_offset) of a P6 PPM header
    (whitespace/comment tolerant) — header-only, never touches the
    raster."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = tokens
    return width, height, maxval, pos


def _ppm_dims(payload: bytes) -> tuple[int, int]:
    w, h, _, _ = _ppm_header(payload)
    return w, h


def decode_ppm(payload: bytes) -> dict:
    """Parse a P6 PPM header (whitespace/comment tolerant) + raster."""
    width, height, maxval, pos = _ppm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raster = payload[pos:pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return {
        "format": "ppm",
        "width": width,
        "height": height,
        "n_elements": width * height * 3,
        "content_checksum": int(
            np.frombuffer(raster, dtype=np.uint8).astype(np.int64).sum()
        ),
    }


def encode_y4m(width: int, height: int, frames: list[bytes], fps: tuple[int, int] = (25, 1)) -> bytes:
    """YUV4MPEG2 uncompressed video, C444 (w*h*3 bytes per frame)."""
    num, den = fps
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n" % (width, height, num, den)]
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame must be width*height*3 bytes (C444)")
        out.append(b"FRAME\n" + f)
    return b"".join(out)


def decode_y4m(payload: bytes) -> dict:
    """Parse a YUV4MPEG2 stream header + FRAME markers; returns raw
    per-frame byte blocks (C444 only)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = None
    num, den = 25, 1
    colorspace = "C420"
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = (int(x) for x in tok[1:].split(b":"))
        elif tok[:1] == b"C":
            colorspace = tok.decode()
    if width is None or height is None:
        raise ValueError("missing W/H in stream header")
    if colorspace != "C444":
        raise ValueError("only C444 supported")
    frame_bytes = width * height * 3
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        frames.append(payload[fnl + 1:fnl + 1 + frame_bytes])
        pos = fnl + 1 + frame_bytes
    n_frames = len(frames)
    return {
        "format": "y4m",
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "fps": (num, den),
        "n_elements": n_frames * frame_bytes,
        "duration_ms": n_frames * 1000 * den // num,
        "content_checksum": int(
            np.frombuffer(b"".join(frames), dtype=np.uint8).astype(np.int64).sum()
        ),
        "frames": frames,
    }


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): the neighbor (left/up/
    up-left) closest to the linear estimate a+b-c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit RGB (color type 2) PNG; ``pixels`` is width*height*3 bytes.
    Scanline ``r`` uses filter ``r % 5``, so a round trip exercises all
    five PNG filters (None/Sub/Up/Average/Paeth) — the fixture builder
    for the real-COMPRESSED-format decode path (stdlib zlib DEFLATE)."""
    import zlib

    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    stride = width * 3
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride:(r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            pred = (
                0 if ft == 0
                else a if ft == 1
                else b if ft == 2
                else (a + b) // 2 if ft == 3
                else _paeth(a, b, c)
            )
            raw.append((line[i] - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int) -> np.ndarray:
    """Undo the per-scanline filters of a decompressed 8-bit RGB IDAT
    stream; returns the interleaved RGB raster as uint8."""
    stride = width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad raster size after inflate")
    prev = [0] * stride
    out = []
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)]
        if ft == 0:
            cur = list(line)
        elif ft == 2:  # Up — vectorizable, and the common filter
            cur = [(v + p) & 0xFF for v, p in zip(line, prev)]
        elif ft in (1, 3, 4):
            cur = [0] * stride
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                pred = (
                    a if ft == 1
                    else (a + b) // 2 if ft == 3
                    else _paeth(a, b, c)
                )
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out.append(cur)
        prev = cur
    return np.array(out, dtype=np.uint8).reshape(-1)


def _png_raster(payload: bytes) -> np.ndarray:
    """Interleaved RGB bytes of an 8-bit color-type-2 PNG: chunk walk
    with CRC verification → concatenated-IDAT inflate → unfilter."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + size:pos + 12 + size])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, bit_depth, color_type, _, _, interlace = ihdr
    if bit_depth != 8 or color_type != 2 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced RGB PNG supported")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG inflate failed: {exc}") from exc
    return _png_unfilter(raw, width, height)


def decode_png(payload: bytes) -> dict:
    """Parse an 8-bit RGB PNG (the one compressed format decodable with
    stdlib only): signature + CRC-checked chunk walk + DEFLATE + the
    five scanline filters. Same feature contract as the other decoders
    (exact integer checksum → oracle-reproducible)."""
    raster = _png_raster(payload)
    (width, height) = _png_dims(payload)
    return {
        "format": "png",
        "width": width,
        "height": height,
        "n_elements": int(raster.size),
        "content_checksum": int(raster.astype(np.int64).sum()),
    }


def _png_dims(payload: bytes) -> tuple[int, int]:
    if payload[:8] != PNG_SIG or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG payload")
    width, height = struct.unpack(">II", payload[16:24])
    return int(width), int(height)


def _decode_payload_real(payload: bytes | None) -> dict | None:
    """Magic-byte dispatch to the pure-Python decoders; ``None`` for
    null/unparseable payloads (quarantine posture, not task failure)."""
    if payload is None:
        return None
    try:
        if payload[:4] == b"RIFF":
            return decode_wav(payload)
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        if payload[:9] == b"YUV4MPEG2":
            return decode_y4m(payload)
        if payload[:8] == PNG_SIG:
            return decode_png(payload)
    except (ValueError, struct.error, IndexError):
        return None
    return None


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

    ``decode="real"`` runs the pure-Python WAV/PPM/Y4M parsers on the
    actual payload bytes: ``feature_dim`` becomes the decoded element
    count (PCM samples / raster bytes) and ``feature_checksum`` the
    integer sum of decoded values — order-independent exact integer
    arithmetic, so an oracle can reproduce it. Null/unparseable payloads
    get null features (quarantine posture). A PIL/ffmpeg kernel for
    compressed formats extends ``_decode_payload_real``'s dispatch.
    """
    if decode == "real":

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                decoded = pdf["payload"].map(_decode_payload_real)
                sha = pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "payload_bytes": pdf["payload"].map(
                            lambda b: len(b) if b is not None else 0
                        ),
                        "payload_sha256": sha,
                        "feature_dim": pd.array(
                            [d["n_elements"] if d else None for d in decoded],
                            dtype="Int32",
                        ),
                        "feature_checksum": pd.array(
                            [d["content_checksum"] if d else None for d in decoded],
                            dtype="Int64",
                        ),
                    }
                )

    else:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _decode_batch_fake(pdf)

    # Column pruning matters here: select only what the kernel needs so
    # the scan never reads un-needed metadata columns alongside payloads.
    pruned = df.select("media_id", "kind", "payload")
    return pruned.mapInPandas(kernel, FEATURE_SCHEMA)


#: Real-decode output: one row per media with format-specific header
#: fields (audio columns null for images and vice versa). All-long
#: numerics keep the DuckDB oracle comparison type-exact.
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("bits_per_sample", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("n_elements", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("content_checksum", LongType(), True),
    ]
)

_DECODED_FIELDS = [f.name for f in DECODED_SCHEMA.fields if f.name != "media_id"]


def decode_media(df: DataFrame) -> DataFrame:
    """Full real-decode surface: parse every payload with the
    WAV/PPM/Y4M/PNG decoders and emit header fields + content checksum.
    Map-only (one Arrow stage, no shuffle); scans prune to
    (media_id, payload)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_payload_real)
            cols = {"media_id": pdf["media_id"]}
            for name in _DECODED_FIELDS:
                vals = [d.get(name) if d else None for d in decoded]
                cols[name] = (
                    pd.array(vals, dtype="object")
                    if name == "format"
                    else pd.array(vals, dtype="Int64")
                )
            yield pd.DataFrame(cols)

    return df.select("media_id", "payload").mapInPandas(kernel, DECODED_SCHEMA)


ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("energy", LongType(), False),
    ]
)


def audio_frame_energy(df: DataFrame, frame_size: int = 256) -> DataFrame:
    """Audio feature extraction over real-decoded WAV payloads: fixed
    ``frame_size``-sample framing + per-frame energy (exact int64
    Σ sample² — the integer core of RMS/VAD front-ends, so the result
    is engine-reproducible). Non-WAV / unparseable payloads are skipped
    (quarantine posture); the trailing partial frame is kept with its
    actual ``n_samples``. Map-only Arrow stage, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, counts, energies = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = decode_wav(bytes(payload)) if payload is not None else None
                except ValueError:
                    d = None
                if d is None:
                    continue
                samples = _wav_samples(bytes(payload))
                sq = samples.astype(np.int64) ** 2
                n = len(sq)
                for f in range(0, max((n + frame_size - 1) // frame_size, 0)):
                    chunk = sq[f * frame_size:(f + 1) * frame_size]
                    ids.append(int(media_id))
                    frames.append(f)
                    counts.append(len(chunk))
                    energies.append(int(chunk.sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(frames, dtype="Int64"),
                    "n_samples": pd.array(counts, dtype="Int64"),
                    "energy": pd.array(energies, dtype="Int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(kernel, ENERGY_SCHEMA)


def _wav_samples(payload: bytes) -> np.ndarray:
    """int16 sample array of a PCM WAV (RIFF chunk walk, like
    :func:`decode_wav` but returning the data instead of features)."""
    pos, data = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        return np.array([], dtype="<i2")
    return np.frombuffer(data[: (len(data) // 2) * 2], dtype="<i2")


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
    (payload sha, frame index); ``decode="real"`` parses Y4M
    (YUV4MPEG2) payloads with the pure-Python decoder and hashes the
    actual raw frame bytes — an ffmpeg kernel for compressed containers
    replaces the decode call, same batch shape.
    """
    if decode == "real":

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_sha256": []}
                for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                    d = _decode_payload_real(payload)
                    if not d or d.get("format") != "y4m" or not d["n_frames"]:
                        continue  # quarantine posture: skip, don't fail
                    num, den = d["fps"]
                    # source frame stride closest to the sampling period
                    step = max(1, round(every_ms * num / (1000 * den)))
                    for idx in range(0, d["n_frames"], step):
                        out["media_id"].append(media_id)
                        out["frame_idx"].append(idx)
                        out["frame_ts_ms"].append(idx * 1000 * den // num)
                        out["frame_sha256"].append(
                            hashlib.sha256(d["frames"][idx]).hexdigest()
                        )
                yield pd.DataFrame(
                    {
                        "media_id": pd.array(out["media_id"], dtype="Int64"),
                        "frame_idx": pd.array(out["frame_idx"], dtype="Int32"),
                        "frame_ts_ms": pd.array(out["frame_ts_ms"], dtype="Int64"),
                        "frame_sha256": pd.array(out["frame_sha256"], dtype="object"),
                    }
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
    ``.explain`` ReadSchema excludes ``payload``).

    The mean is exact-integer-sum-then-one-divide (not ``F.avg``) so the
    double result is bit-identical across engines — same rule as the
    decimal sums in pricing_summary."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        (
            F.sum("duration_ms").cast("double") / F.count("duration_ms")
        ).alias("avg_duration_ms"),
        F.max("width").alias("max_width"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("content_checksum", LongType(), False),
    ]
)


def resize_images(df: DataFrame, out_w: int = 2, out_h: int = 2) -> DataFrame:
    """Nearest-neighbor resize over REAL-decoded image payloads (P6 PPM
    or 8-bit RGB PNG) — the thumbnail/normalization step a vision
    pipeline runs before feature extraction. Source indices use exact
    integer math (``src = dst * in_dim // out_dim``), so the output
    raster is byte-deterministic in any engine; resized images re-encode
    as P6 PPM (the cheapest at-rest form for a downstream decode).
    Non-image / corrupt payloads are skipped (quarantine posture).
    Map-only Arrow stage, no shuffle; the scan prunes to
    (media_id, payload)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads, sums = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                # header-only dims first (cheap), then decode the raster
                # ONCE — dims via decode_ppm/decode_png would re-run the
                # full inflate+unfilter+checksum a second time per image
                try:
                    if b[:2] == b"P6":
                        w, h = _ppm_dims(b)
                    elif b[:8] == PNG_SIG:
                        w, h = _png_dims(b)
                    else:
                        continue
                except (ValueError, struct.error, IndexError):
                    continue
                ras = _image_raster(b)
                if ras.size != w * h * 3 or ras.size == 0:
                    continue
                img = ras.reshape(h, w, 3)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out = np.ascontiguousarray(img[yi][:, xi, :])
                ids.append(int(media_id))
                ws.append(out_w)
                hs.append(out_h)
                payloads.append(encode_ppm(out_w, out_h, out.tobytes()))
                sums.append(int(out.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "payload": payloads,
                    "content_checksum": pd.array(sums, dtype="Int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(kernel, RESIZED_SCHEMA)


def media_fixture_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media corpus from the ``documents`` table: even
    doc_ids become 8 kHz mono 16-bit WAVs whose PCM samples are derived
    from the text codepoints (``(cp*131) % 65536 - 32768``), odd doc_ids
    become 4×4 P6 PPMs with pixels ``(cp*7) % 256`` cycled over the
    text. Because encode→decode round-trips the parameters exactly, a
    SQL oracle can compute the decoded features straight from ``text`` —
    which is what makes the real-decode path oracle-checkable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # exact codepoints, vectorized (no per-char ord loop)
                cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(
                    np.int64
                )
                if doc_id % 2 == 0:
                    samples = ((cps * 131) % 65536 - 32768).astype("<i2")
                    kinds.append("audio")
                    payloads.append(_encode_wav_pcm(samples.tobytes(), 8000, 1))
                else:
                    pix = ((np.resize(cps, 48) * 7) % 256).astype(np.uint8)
                    kinds.append("image")
                    payloads.append(encode_ppm(4, 4, pix.tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(pdf["doc_id"], dtype="Int64"),
                    "kind": kinds,
                    "payload": payloads,
                }
            )

    fixture_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(kernel, fixture_schema)


def png_fixture_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic COMPRESSED-image corpus from ``documents``: every
    non-empty doc becomes a 4×5 8-bit RGB PNG whose 60 raster bytes are
    ``(cp*7) % 256`` cycled over the text codepoints — the same pixel
    law as the PPM fixture, but round-tripped through DEFLATE and all
    five PNG scanline filters (row ``r`` encodes with filter ``r % 5``).
    Because decode must invert the filters exactly to recover the
    raster, an oracle computing the histogram straight from the text
    codepoints proves the whole compressed path bit-exact."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:
                    continue
                cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(
                    np.int64
                )
                pix = ((np.resize(cps, 60) * 7) % 256).astype(np.uint8)
                ids.append(int(doc_id))
                kinds.append("image")
                payloads.append(encode_png(4, 5, pix.tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "kind": kinds,
                    "payload": payloads,
                }
            )

    fixture_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(kernel, fixture_schema)


HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("channel", LongType(), False),
        StructField("bucket", LongType(), False),
        StructField("n_pixels", LongType(), False),
    ]
)


def _image_raster(payload: bytes) -> np.ndarray:
    """Interleaved RGB bytes of any supported image payload (P6 PPM or
    8-bit RGB PNG); empty array for anything else — the quarantine
    posture shared by every media kernel."""
    try:
        if payload[:2] == b"P6":
            return _ppm_pixels(payload)
        if payload[:8] == PNG_SIG:
            return _png_raster(payload)
    except (ValueError, struct.error, IndexError):
        pass
    return np.array([], dtype=np.uint8)


def image_channel_histogram(df: DataFrame, bucket_width: int = 32) -> DataFrame:
    """Per-channel pixel-intensity histograms over REAL-decoded image
    payloads (P6 PPM and 8-bit RGB PNG) — the color-profile feature a
    vision pipeline extracts before training-set balancing. Channels
    are the interleaved R/G/B planes (0/1/2), buckets are ``value div
    bucket_width`` (8 buckets at the default). Unparseable / non-image
    payloads are skipped (the quarantine posture). Map-only Arrow
    stage; the tiny per-image histogram rows aggregate downstream if
    the caller wants corpus totals."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chans, buckets, counts = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                pix = _image_raster(bytes(payload))
                if pix.size == 0:
                    continue
                ch = np.arange(pix.size) % 3
                bk = pix.astype(np.int64) // bucket_width
                key = ch * 1000 + bk
                uniq, cnt = np.unique(key, return_counts=True)
                for k, c in zip(uniq, cnt):
                    ids.append(int(media_id))
                    chans.append(int(k // 1000))
                    buckets.append(int(k % 1000))
                    counts.append(int(c))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "channel": pd.array(chans, dtype="Int64"),
                    "bucket": pd.array(buckets, dtype="Int64"),
                    "n_pixels": pd.array(counts, dtype="Int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(kernel, HIST_SCHEMA)


def _ppm_pixels(payload: bytes) -> np.ndarray:
    """Raw interleaved RGB bytes of a P6 PPM: the pixel plane is
    exactly width·height·3 bytes at the END of the file (the header
    dimensions come from :func:`decode_ppm`)."""
    try:
        d = decode_ppm(payload)
    except ValueError:
        return np.array([], dtype=np.uint8)
    n = int(d["width"]) * int(d["height"]) * 3
    if n <= 0 or n > len(payload):
        return np.array([], dtype=np.uint8)
    return np.frombuffer(payload[len(payload) - n:], dtype=np.uint8)
