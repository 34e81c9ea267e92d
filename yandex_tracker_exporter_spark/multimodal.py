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
- ``decode="real"`` — pure-Python parsers for six public formats:
  **WAV** (RIFF integer PCM at 8/16/24/32-bit, plain or
  WAVE_FORMAT_EXTENSIBLE-wrapped; IEEE-float → typed quarantine),
  **PNM** (the whole netpbm family: P1-P3 ASCII and P4-P6 binary
  bitmaps/graymaps/pixmaps, 8- and 16-bit),
  **Y4M** (YUV4MPEG2 uncompressed video: C444/C422/C420 siting
  variants/C411/Cmono, C-less headers defaulting to C420), **PNG**
  (all RFC 2083
  still-image shapes: colour types 0/2/3/4/6 at their legal bit
  depths incl. 16-bit and bit-packed 1/2/4, PLTE expansion, null +
  Adam7 interlace; zlib DEFLATE via stdlib + all five scanline
  filters), **JPEG** (baseline
  + extended sequential at 8- and 12-bit precision, AND progressive
  SOF2 — spectral selection, successive approximation, DC/AC
  refinement scans, EOB runs; canonical Huffman from DHT, DC
  prediction, zigzag, dequant, 8x8 IDCT, 4:2:0/4:2:2/4:4:4 sampling,
  restart markers),
  and **MP4** (ISO BMFF box-level metadata: mvhd duration/timescale,
  tkhd 16.16 dimensions). These decode actual payload bytes
  end-to-end; a PIL/ffmpeg kernel for other codecs plugs into the
  same dispatch table.

Unparseable payloads yield null features instead of failing the task —
the corrupt-row quarantine posture of SURVEY §2 F8, which is the only
sane behavior when scanning 100 TB of crawled media.
"""

from __future__ import annotations

import hashlib
import re
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

#: Memory/CPU-bomb guard for the raster decoders (PNG / JPEG): maximum
#: decoded samples (width × height × components) a single payload may
#: claim before it quarantines. 2^22 ≈ a 2048×2048 gray or 1184²
#: RGB frame — sized for the pure-Python block loops, not for the
#: format. A MODULE CONSTANT (ADVICE r7) so a deployment with real
#: codec kernels can raise it in one place, and cap-quarantined rows
#: are distinguishable from malformed ones via
#: :func:`media_quarantine_report` (reason_class "cap_exceeded").
DECODE_SAMPLE_CAP = 1 << 22


class DecodeCapExceeded(ValueError):
    """A payload was structurally valid but larger than
    :data:`DECODE_SAMPLE_CAP` — quarantined by POLICY, not malformed.
    A dedicated type (ADVICE r8): the quarantine classifier used to
    substring-match "decode cap" in the ValueError message, so any
    rewording of a decoder's message silently reclassified
    cap-quarantined media as "malformed" in the report."""


def _encode_wav_pcm(data: bytes, sample_rate: int, n_channels: int) -> bytes:
    """RIFF/WAVE wrapper around raw little-endian int16 PCM bytes.

    RIFF size law (r12 review fix): the field counts everything after
    the 8-byte RIFF header — 4 ("WAVE") + the fmt chunk (its 4-byte
    size field is already inside ``fmt``, so + 4 for the tag) + the
    8-byte data header + the data. The old formula double-counted the
    fmt size field (+4), which this repo's parser ignores but a strict
    external reader would flag on every fixture."""
    fmt = struct.pack(
        "<IHHIIHH", 16, 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 4 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_wav(samples: list[int], sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """16-bit little-endian PCM WAV (RIFF) from int16 sample values."""
    return _encode_wav_pcm(
        struct.pack("<%dh" % len(samples), *samples), sample_rate, n_channels
    )


def encode_wav_ex(
    samples: list[int],
    sample_rate: int = 8000,
    n_channels: int = 1,
    bits: int = 16,
    extensible: bool = False,
) -> bytes:
    """PCM WAV fixture builder at any supported width (round 12 twin of
    the :func:`_wav_parse` widening): 8/16/24/32-bit integer PCM,
    optionally wrapped in WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE + PCM
    SubFormat GUID — what multichannel/24-bit encoders actually emit).
    ``samples`` are CENTERED values at every width (8-bit is stored
    unsigned on disk, +128, matching the decoder's centering)."""
    if bits == 8:
        data = bytes((int(s) + 128) & 0xFF for s in samples)
    elif bits == 16:
        data = struct.pack("<%dh" % len(samples), *samples)
    elif bits == 24:
        data = b"".join(
            struct.pack("<i", int(s) << 8)[1:] for s in samples
        )
    elif bits == 32:
        data = struct.pack("<%di" % len(samples), *samples)
    else:
        raise ValueError("bits must be 8/16/24/32")
    step = bits // 8
    if extensible:
        # {00000001-0000-0010-8000-00AA00389B71} = KSDATAFORMAT_SUBTYPE_PCM
        guid = b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        fmt = struct.pack(
            "<IHHIIHHHHI", 40, 0xFFFE, n_channels, sample_rate,
            sample_rate * n_channels * step, n_channels * step, bits,
            22, bits, 0,
        ) + guid
    else:
        fmt = struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate,
            sample_rate * n_channels * step, n_channels * step, bits,
        )
    # RIFF size: everything after the 8-byte RIFF header; ``fmt``
    # already carries its own 4-byte size field (r12 review fix — the
    # old formula double-counted it by 4)
    return (
        b"RIFF" + struct.pack("<I", 4 + 4 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _wav_parse(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """(n_channels, sample_rate, bits, integer samples) of a PCM WAV
    at 8/16/24/32-bit (plain fmt=1 or WAVE_FORMAT_EXTENSIBLE-wrapped;
    8-bit centered, 24-bit sign-extended — round 12 widening) —
    the SINGLE RIFF chunk walk behind both :func:`decode_wav` and
    :func:`audio_frame_energy` (walking and copying the payload twice
    per row is pure waste on the audio fraction of a 100 TB corpus).
    All malformations raise ValueError so every quarantine handler
    catches them."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fmt_body, data = 12, None, b"", None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + size > len(payload):
            # Junk wave 4: Python slicing silently TRUNCATES an
            # out-of-range chunk body, so a WAV cut mid-data — or one
            # whose data chunk CLAIMS multi-GB — used to decode "ok"
            # with fabricated duration/checksum, presenting damaged
            # audio as complete. Every sibling decoder rejects
            # truncation (PPM strict raster, Y4M frame check, PNG CRC,
            # MP4 box-size check); WAV must too.
            raise ValueError("truncated WAV chunk (declared size overruns payload)")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                # struct.error would escape handlers that catch only
                # ValueError — normalize here
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE (round 12): the real format lives in
        # the first two bytes of the 16-byte SubFormat GUID at body
        # offset 24 (cbSize 22 layout). Multichannel/24-bit encoders
        # emit this wrapper routinely; rejecting it as "fmt=65534"
        # would quarantine perfectly good PCM.
        if len(fmt_body) < 40:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (audio_format,) = struct.unpack("<H", fmt_body[24:26])
    if audio_format == 3:
        # IEEE-float WAV: decodable, but the downstream feature law
        # (audio_frame_energy's EXACT int64 sum of squares) is defined
        # over integer PCM — a float path would need a different,
        # inexact energy contract. Honest typed bound, like
        # arithmetic-coded JPEG.
        raise ValueError("IEEE-float WAV unsupported (integer-PCM energy contract)")
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format}")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit width {bits}")
    if sample_rate <= 0:
        # a crafted fmt chunk with rate 0 would ZeroDivisionError out of
        # every quarantine handler downstream (they catch ValueError)
        raise ValueError("non-positive sample rate")
    step = bits // 8
    n_values = len(data) // step
    # vectorized decode (identical to summing struct.unpack'ed Python
    # ints, ~30× cheaper). Widths (round 12, was 16-bit-only):
    # 8-bit PCM is UNSIGNED on disk — decoded centered (v-128) so
    # silence is 0 at every width; 24-bit is sign-extended 3-byte LE.
    raw = data[: n_values * step]
    if bits == 8:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
    elif bits == 16:
        samples = np.frombuffer(raw, dtype="<i2")
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = v - ((v & 0x800000) << 1)
    else:  # 32
        samples = np.frombuffer(raw, dtype="<i4")
    return n_channels, sample_rate, bits, samples


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM WAV: walks RIFF chunks (tolerates extra chunks such as
    LIST/INFO), returns header fields + decoded integer samples
    (8/16/24/32-bit; checksum is the exact int64 sum at every width)."""
    n_channels, sample_rate, bits, samples = _wav_parse(payload)
    n_values = len(samples)
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


#: PNM family (round 12 — was P6-only): magic → (format label,
#: header token count, samples per pixel). P1/P4 bitmaps carry no
#: maxval token; P2/P5 are grayscale; P3/P6 RGB. "ascii" vs "binary"
#: raster is the magic's parity (P1-P3 ascii, P4-P6 binary).
_PNM_TYPES = {
    b"P1": ("pbm", 2, 1), b"P2": ("pgm", 3, 1), b"P3": ("ppm", 3, 3),
    b"P4": ("pbm", 2, 1), b"P5": ("pgm", 3, 1), b"P6": ("ppm", 3, 3),
}


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, raster_offset) of any PNM header
    (whitespace/comment tolerant) — header-only, never touches the
    raster. P1/P4 have no maxval token; their maxval is 1."""
    magic = payload[:2]
    if magic not in _PNM_TYPES:
        raise ValueError("not a PNM payload")
    _, n_tokens, _ = _PNM_TYPES[magic]
    pos, tokens = 2, []
    while len(tokens) < n_tokens and pos < len(payload):
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
    pos += 1  # single whitespace after the last header token
    if len(tokens) < n_tokens:
        raise ValueError("truncated PNM header")
    width, height = tokens[0], tokens[1]
    maxval = tokens[2] if n_tokens == 3 else 1
    if width <= 0 or height <= 0 or maxval <= 0:
        raise ValueError("non-positive PPM dimensions")
    if maxval > 65535:
        raise ValueError("PNM maxval above 65535")
    return magic, width, height, maxval, pos


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, raster_offset) of a P6 PPM header — the
    RGB-pixel-op entry point (histogram/resize consume P6 only); the
    general tokenizer lives in :func:`_pnm_header`. The non-positive
    dimension guard matters because negative dims can pass the w*h*3
    length checks (product of two negatives) and reach a
    reshape(-1, -3, 3) outside any handler."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    _, width, height, maxval, pos = _pnm_header(payload)
    return width, height, maxval, pos


def _ppm_dims(payload: bytes) -> tuple[int, int]:
    w, h, _, _ = _ppm_header(payload)
    return w, h


def decode_ppm(payload: bytes) -> dict:
    """Parse any PNM payload (round 12 — was binary-P6-only): P1-P3
    ASCII and P4-P6 binary bitmaps/graymaps/pixmaps, 8- AND 16-bit
    (maxval > 255 → two-byte big-endian samples, the netpbm law).
    Strict raster length/count everywhere: payloads with trailing or
    missing samples quarantine, the SAME rule as :func:`_ppm_pixels` —
    metadata/checksum scans and histogram/resize must agree on which
    images are valid (a corpus member must never be counted by one and
    silently dropped by the other). PNM needs no dimension cap: every
    raster read is sliced from the actual payload and length-checked,
    so a lying header fails the strict-length law before any
    dimension-proportional work."""
    magic, width, height, maxval, pos = _pnm_header(payload)
    label, _, channels = _PNM_TYPES[magic]
    n_samples = width * height * channels
    if magic == b"P4":  # packed bitmap, rows padded to byte boundary
        stride = (width + 7) // 8
        if len(payload) != pos + stride * height:
            raise ValueError("PPM raster length mismatch")
        rows = np.frombuffer(
            payload[pos:], dtype=np.uint8
        ).reshape(height, stride)
        bits = np.unpackbits(rows, axis=1)[:, :width]
        total = int(bits.astype(np.int64).sum())
    elif magic in (b"P5", b"P6"):
        step = 2 if maxval > 255 else 1
        if len(payload) != pos + n_samples * step:
            raise ValueError("PPM raster length mismatch")
        dt = ">u2" if step == 2 else np.uint8
        total = int(
            np.frombuffer(payload[pos:], dtype=dt).astype(np.int64).sum()
        )
    else:  # P1/P2/P3 — ASCII samples, comments allowed
        body = re.sub(rb"#[^\n]*", b"", payload[pos - 1:])
        if magic == b"P1":
            # P1 bits may run together without whitespace ("0110") —
            # the spec's own examples do; strip whitespace, then every
            # remaining char must be a bit
            digits = re.sub(rb"\s", b"", body)
            if len(digits) != n_samples:
                raise ValueError("PPM raster length mismatch")
            if digits.strip(b"01"):
                raise ValueError("PNM sample exceeds maxval")
            vals = np.frombuffer(digits, np.uint8).astype(np.int64) - 48
        else:
            toks = body.split()
            if len(toks) != n_samples:
                raise ValueError("PPM raster length mismatch")
            # r12 review: a crafted 30-digit token raises OverflowError
            # (not ValueError) inside the int64 array build, escaping
            # every quarantine handler and killing the scan task —
            # maxval <= 65535, so any token past 6 digits is junk
            if any(len(t) > 6 for t in toks):
                raise ValueError("PNM sample exceeds maxval")
            vals = np.array([int(t) for t in toks], dtype=np.int64)
            if (vals < 0).any() or (vals > maxval).any():
                raise ValueError("PNM sample exceeds maxval")
        total = int(vals.sum())
    return {
        "format": label,
        "width": width,
        "height": height,
        "n_elements": n_samples,
        "content_checksum": total,
    }


def _y4m_frame_bytes(width: int, height: int, colorspace: str) -> int:
    """Frame byte count for a YUV4MPEG2 colorspace tag (round 12 — was
    C444-only; C420 is the overwhelmingly common wild format):

    - ``C444``                      → w·h·3 (full chroma)
    - ``C422``                      → w·h·2 (chroma halved in x; w even)
    - ``C420`` (+ ``jpeg``/``paldv``/``mpeg2`` siting variants — same
      plane sizes, different chroma sample SITING, which does not
      change the byte layout) and ``C411`` → w·h·3/2 (w,h even for
      420; w divisible by 4 for 411)
    - ``Cmono``                     → w·h (luma only)

    Unknown tags raise (typed quarantine)."""
    if colorspace == "C444":
        return width * height * 3
    if colorspace == "C422":
        if width % 2:
            raise ValueError("C422 requires even width")
        return width * height * 2
    if colorspace in ("C420", "C420jpeg", "C420paldv", "C420mpeg2"):
        if width % 2 or height % 2:
            raise ValueError("C420 requires even dimensions")
        return width * height * 3 // 2
    if colorspace == "C411":
        if width % 4:
            raise ValueError("C411 requires width divisible by 4")
        return width * height * 3 // 2
    if colorspace == "Cmono":
        return width * height
    raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")


def encode_y4m(
    width: int,
    height: int,
    frames: list[bytes],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C444",
) -> bytes:
    """YUV4MPEG2 uncompressed video at any supported colorspace
    (default C444 — the byte-stable fixture shape)."""
    num, den = fps
    fb = _y4m_frame_bytes(width, height, colorspace)
    out = [
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n"
        % (width, height, num, den, colorspace.encode())
    ]
    for f in frames:
        if len(f) != fb:
            raise ValueError(
                f"frame must be {fb} bytes ({colorspace})"
            )
        out.append(b"FRAME\n" + f)
    return b"".join(out)


def decode_y4m(payload: bytes) -> dict:
    """Parse a YUV4MPEG2 stream header + FRAME markers; returns raw
    per-frame byte blocks. Colorspaces C444/C422/C420(+siting
    variants)/C411/Cmono (round 12 — a stream with NO C tag defaults
    to C420 per the mjpegtools convention, which the old C444-only
    parser rejected)."""
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
    if width is None or height is None or width <= 0 or height <= 0:
        raise ValueError("missing/non-positive W/H in stream header")
    if num <= 0 or den <= 0:
        # F0:1 or F25:0 would ZeroDivisionError in duration_ms here or
        # in sample_frames' per-frame step computation
        raise ValueError("non-positive frame rate")
    frame_bytes = _y4m_frame_bytes(width, height, colorspace)
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        frame = payload[fnl + 1:fnl + 1 + frame_bytes]
        if len(frame) != frame_bytes:
            # a truncated final frame would be counted by n_elements but
            # only partially summed into the checksum — strict length,
            # the decode_ppm rule
            raise ValueError("truncated FRAME body")
        frames.append(frame)
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


def _png_filter_line(line: bytes, prev: bytes, ft: int, bpp: int) -> bytes:
    """Apply PNG filter ``ft`` to one raw scanline (RFC 2083 §6): the
    filter operates on BYTES with the left neighbor ``bpp`` bytes back
    (bytes-per-complete-pixel, rounded up to 1 for sub-byte depths)."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        pred = (
            0 if ft == 0
            else a if ft == 1
            else b if ft == 2
            else (a + b) // 2 if ft == 3
            else _paeth(a, b, c)
        )
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit RGB (color type 2) PNG; ``pixels`` is width*height*3 bytes.
    Scanline ``r`` uses filter ``r % 5``, so a round trip exercises all
    five PNG filters (None/Sub/Up/Average/Paeth) — the fixture builder
    for the real-COMPRESSED-format decode path (stdlib zlib DEFLATE).

    Byte-stable by contract: the `media_png_histogram` oracle
    recomputes pixels from document text, so this builder's output for
    a given input must never drift."""
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
        raw += _png_filter_line(line, prev, ft, 3)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


#: colour type → channel count (RFC 2083 §4.1.1); palette rasters are
#: 1-channel indices until PLTE expansion
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: legal bit depths per colour type (spec table in §4.1.1)
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
#: Adam7 pass grid (x0, y0, dx, dy) — RFC 2083 §2.6; each pass is an
#: independently filtered sub-image, empty passes contribute no bytes
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_passes(width: int, height: int, interlace: int):
    """(x0, y0, dx, dy, w_p, h_p) for each non-empty pass."""
    grids = _ADAM7 if interlace else ((0, 0, 1, 1),)
    out = []
    for x0, y0, dx, dy in grids:
        w_p = max(0, -(-(width - x0) // dx))
        h_p = max(0, -(-(height - y0) // dy))
        if w_p and h_p:
            out.append((x0, y0, dx, dy, w_p, h_p))
    return out


def _png_unfilter_lines(
    raw: bytes, stride: int, height: int, bpp: int
) -> list[bytes]:
    """Undo the per-scanline filters of one (sub-)image's filtered
    stream; generalization of the old RGB8-only path to any
    bytes-per-pixel (sub-byte depths filter with bpp=1 per spec)."""
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
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pred = (
                    a if ft == 1
                    else (a + b) // 2 if ft == 3
                    else _paeth(a, b, c)
                )
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out.append(bytes(cur))
        prev = cur
    return out


def _png_unpack_line(
    line: bytes, n_samples: int, depth: int
) -> np.ndarray:
    """Samples of one unfiltered scanline: 8-bit direct, 16-bit
    big-endian, sub-byte depths MSB-first with end-of-line padding."""
    if depth == 8:
        return np.frombuffer(line, np.uint8)[:n_samples]
    if depth == 16:
        return np.frombuffer(line, ">u2")[:n_samples].astype(np.uint16)
    bits = np.unpackbits(np.frombuffer(line, np.uint8))
    vals = bits[: n_samples * depth].reshape(n_samples, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (vals * weights).sum(axis=1).astype(np.uint8)


def _png_pack_line(samples, depth: int) -> bytes:
    """Inverse of :func:`_png_unpack_line` (fixture builder side)."""
    if depth == 8:
        return bytes(int(s) & 0xFF for s in samples)
    if depth == 16:
        return b"".join(struct.pack(">H", int(s) & 0xFFFF) for s in samples)
    out = bytearray()
    acc = nbits = 0
    for s in samples:
        acc = (acc << depth) | (int(s) & ((1 << depth) - 1))
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc = nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


def _png_raster(payload: bytes) -> np.ndarray:
    """Decoded samples of a PNG as a flat interleaved array: chunk walk
    with CRC verification → concatenated-IDAT inflate (output-bounded)
    → per-pass unfilter → bit/16-bit unpack → Adam7 de-interlace →
    PLTE expansion.

    Round 12 widened this from "8-bit non-interlaced RGB only" to the
    full RFC 2083 still-image matrix: colour types 0/2/3/4/6 at their
    legal bit depths (1/2/4/8/16 gray, 8/16 RGB(A) and gray+alpha,
    1/2/4/8 palette) and interlace methods 0/1 (Adam7, each pass an
    independently filtered sub-image; empty passes contribute no
    bytes). Palette rasters expand through PLTE to RGB — pinned
    differentially: the SAME pixels encoded as plain RGB, as palette,
    and as Adam7-interlaced anything decode to identical rasters
    (tests/test_png_formats.py). 16-bit samples return uint16 (checksum
    law unchanged: exact integer sum over decoded samples)."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, bytearray(), None
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
        elif tag == b"PLTE":
            if len(body) % 3 or not body:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("bad PNG compression/filter/interlace method")
    if color_type not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[color_type]:
        raise ValueError("illegal PNG colour-type/bit-depth combination")
    if width <= 0 or height <= 0:
        raise ValueError("bad PNG dimensions")
    channels = _PNG_CHANNELS[color_type]
    out_channels = 3 if color_type == 3 else channels
    # memory-bomb guard, same class as the JPEG sample cap: a 1 MB IDAT
    # of compressed zeros under an IHDR claiming 20000x20000 would
    # inflate ~GBs and run an O(pixels) pure-Python unfilter BEFORE the
    # raster-size check. Cap the claimed dimensions, then inflate with
    # an explicit output bound so a lying stream can never expand past
    # the raster the header promises. (Output samples, not raw bytes,
    # carry the cap — the law the round-8 RGB path set.)
    if width * height * out_channels * (2 if depth == 16 else 1) > (
        DECODE_SAMPLE_CAP
    ):
        raise DecodeCapExceeded("image dimensions exceed decode cap")
    passes = _png_passes(width, height, interlace)
    strides = [
        (w_p * channels * depth + 7) // 8 for _, _, _, _, w_p, h_p in passes
    ]
    expected = sum(
        (s + 1) * h_p for s, (_, _, _, _, _, h_p) in zip(strides, passes)
    )
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if d.unconsumed_tail or d.decompress(b"", 1):
            raise ValueError("IDAT inflates past the declared raster")
    except zlib.error as exc:
        raise ValueError(f"PNG inflate failed: {exc}") from exc
    dtype = np.uint16 if depth == 16 else np.uint8
    img = np.zeros((height, width, channels), dtype=dtype)
    bpp = max(1, channels * depth // 8)
    off = 0
    for stride, (x0, y0, dx, dy, w_p, h_p) in zip(strides, passes):
        span = (stride + 1) * h_p
        lines = _png_unfilter_lines(raw[off:off + span], stride, h_p, bpp)
        off += span
        sub = np.stack(
            [_png_unpack_line(ln, w_p * channels, depth) for ln in lines]
        ).reshape(h_p, w_p, channels)
        img[y0::dy, x0::dx] = sub
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        if len(plte) > (1 << depth):
            raise ValueError("PLTE larger than the bit depth allows")
        idx = img[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        img = plte[idx]
    return img.reshape(-1)


def encode_png_ex(
    width: int,
    height: int,
    samples,
    color_type: int = 2,
    bit_depth: int = 8,
    interlace: int = 0,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """General PNG fixture builder (the :func:`_png_raster` widening's
    differential twin): any legal colour-type/bit-depth combination,
    null or Adam7 interlace. ``samples`` is the flat interleaved sample
    list (palette indices for colour type 3). Scanline filters cycle
    ``global_line % 5`` ACROSS passes so an interlaced fixture
    exercises every filter in every sub-image position.

    :func:`encode_png` (the byte-stable RGB8 contract builder) is
    deliberately untouched — its output feeds the oracle-pinned
    media fixtures."""
    import zlib

    channels = _PNG_CHANNELS[color_type]
    if bit_depth not in _PNG_DEPTHS[color_type]:
        raise ValueError("illegal colour-type/bit-depth combination")
    if len(samples) != width * height * channels:
        raise ValueError("samples must be width*height*channels long")
    if color_type == 3 and palette is None:
        raise ValueError("palette required for colour type 3")
    arr = np.asarray(samples, dtype=np.int64).reshape(
        height, width, channels
    )
    bpp = max(1, channels * bit_depth // 8)
    raw = bytearray()
    line_no = 0
    for x0, y0, dx, dy, w_p, h_p in _png_passes(width, height, interlace):
        sub = arr[y0::dy, x0::dx]
        prev = bytes((w_p * channels * bit_depth + 7) // 8)
        for r in range(h_p):
            line = _png_pack_line(sub[r].reshape(-1), bit_depth)
            ft = line_no % 5
            raw.append(ft)
            raw += _png_filter_line(line, prev, ft, bpp)
            prev = line
            line_no += 1
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    chunks = [_png_chunk(b"IHDR", ihdr)]
    if palette is not None:
        chunks.append(
            _png_chunk(b"PLTE", b"".join(bytes(rgb) for rgb in palette))
        )
    chunks.append(_png_chunk(b"IDAT", zlib.compress(bytes(raw))))
    chunks.append(_png_chunk(b"IEND", b""))
    return PNG_SIG + b"".join(chunks)


def decode_png(payload: bytes) -> dict:
    """Parse a PNG (the one compressed format decodable with stdlib
    only): signature + CRC-checked chunk walk + DEFLATE + the five
    scanline filters, all colour types/bit depths, Adam7. Same feature
    contract as the other decoders (exact integer checksum →
    oracle-reproducible)."""
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


def _dispatch_decoder(payload: bytes):
    """Magic-byte dispatch table: the decoder for this payload, or
    ``None`` when no magic matches."""
    if payload[:4] == b"RIFF":
        return decode_wav
    if payload[:2] in _PNM_TYPES:
        return decode_ppm
    if payload[:9] == b"YUV4MPEG2":
        return decode_y4m
    if payload[:8] == PNG_SIG:
        return decode_png
    if payload[:2] == JPEG_SOI:
        return decode_jpeg
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        return decode_mp4_meta
    return None


def _decode_payload_verbose(
    payload: bytes | None,
) -> tuple[dict | None, str, str | None]:
    """(decoded, reason_class, reason) — the quarantine-observable form
    of the decode dispatch (ADVICE r7: a valid-but-large image dropped
    by the sample cap used to be indistinguishable from a malformed
    payload). reason_class: "ok" / "null_payload" / "unknown_format" /
    "cap_exceeded" / "malformed"."""
    if payload is None:
        return None, "null_payload", None
    fn = _dispatch_decoder(payload)
    if fn is None:
        return None, "unknown_format", None
    try:
        return fn(payload), "ok", None
    except (ValueError, struct.error, IndexError, ZeroDivisionError) as exc:
        # ZeroDivisionError is defense-in-depth: the parsers now reject
        # zero rates/denominators with ValueError at the header, but a
        # future field must not be able to kill a 100 TB scan task
        msg = str(exc)
        cls = "cap_exceeded" if isinstance(exc, DecodeCapExceeded) else "malformed"
        return None, cls, msg[:200] or type(exc).__name__


def _decode_payload_real(payload: bytes | None) -> dict | None:
    """Magic-byte dispatch to the pure-Python decoders; ``None`` for
    null/unparseable payloads (quarantine posture, not task failure)."""
    return _decode_payload_verbose(payload)[0]


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


#: media_quarantine_report output: one row per payload the real-decode
#: path quarantines, with a machine-usable class and the parser's
#: message, so "valid media above the sample cap" is observable and
#: distinguishable from genuinely malformed bytes (ADVICE r7).
QUARANTINE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("reason_class", StringType(), True),
        StructField("reason", StringType(), True),
    ]
)


def media_quarantine_report(df: DataFrame) -> DataFrame:
    """Rows that :func:`decode_media` / the ``decode="real"`` feature
    path quarantine, each with its reason class: "null_payload",
    "unknown_format", "cap_exceeded" (valid header, dimensions above
    ``DECODE_SAMPLE_CAP`` — raise the constant to decode them), or
    "malformed" (parser rejected the bytes). Map-only Arrow stage,
    same scan pruning as the decoders; rows that decode cleanly emit
    nothing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, classes, reasons = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                _, cls, msg = _decode_payload_verbose(
                    None if b is None else bytes(b)
                )
                if cls != "ok":
                    ids.append(mid)
                    classes.append(cls)
                    reasons.append(msg)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "reason_class": pd.array(classes, dtype="object"),
                    "reason": pd.array(reasons, dtype="object"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, QUARANTINE_SCHEMA
    )


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
                if payload is None:
                    continue
                try:
                    # ONE RIFF walk per row (was decode_wav + a second
                    # _wav_samples walk over a second bytes() copy)
                    _, _, bits, samples = _wav_parse(bytes(payload))
                except (ValueError, struct.error, IndexError):
                    continue  # quarantine posture: skip, don't fail
                # Exact-law overflow rail (round 12, tightened by the
                # r12 review): a frame's worst-case energy is
                # frame_size * (2^(bits-1))^2 and must FIT the int64
                # output column — 32-bit can never (2^70 at the
                # default), and 24-bit overflows once frame_size
                # exceeds 2^17. Typed skip (quarantine posture), never
                # a silent int64 wrap or a lossy downshift;
                # decode_wav still decodes every width fully.
                if frame_size * (1 << (2 * bits - 2)) >= (1 << 63):
                    continue
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
            ids, kinds, payloads = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:
                    # null/empty text: skip, like every sibling fixture
                    # builder (None.encode would AttributeError the task)
                    continue
                # exact codepoints, vectorized (no per-char ord loop)
                cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(
                    np.int64
                )
                ids.append(int(doc_id))
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
    """Interleaved 8-bit RGB raster of an image payload, or an empty
    array — the single domain gate for the RGB-pixel feature ops
    (histogram/resize). Two-tier contract with the decode/checksum
    tier (round 12, after the format widenings): ``decode_media``
    accepts the FULL PNM family and every RFC 2083 PNG shape, but the
    pixel ops consume exactly the rasters that are 3-channel uint8 —
    P6 with maxval ≤ 255, and PNGs whose decode expands to w*h*3
    uint8 samples (plain RGB8, palette, Adam7 of either). Other VALID
    shapes (16-bit RGB, grayscale, RGBA, gray+alpha) are skipped here
    as out-of-domain, NOT quarantined — without this gate a 16-bit
    RGB PNG passed the old size check as uint16 and crashed
    resize_images in encode_ppm, and grayscale/RGBA rasters got
    fabricated mod-3 channel labels in the histogram (r12 review)."""
    try:
        if payload[:2] == b"P6":
            return _ppm_pixels(payload)
        if payload[:8] == PNG_SIG:
            ras = _png_raster(payload)
            w, h = _png_dims(payload)
            if ras.dtype == np.uint8 and ras.size == w * h * 3:
                return ras
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
    """Raw interleaved RGB bytes of a P6 PPM, sliced from the header's
    raster offset. Payloads whose length is not exactly
    ``offset + width*height*3`` are rejected (empty array → quarantine):
    slicing a trailing-byte payload from the END would silently shift
    every pixel (driver ADVICE r5)."""
    try:
        width, height, maxval, pos = _ppm_header(payload)
    except (ValueError, IndexError):
        return np.array([], dtype=np.uint8)
    n = width * height * 3
    if maxval > 255 or n <= 0 or len(payload) != pos + n:
        return np.array([], dtype=np.uint8)
    return np.frombuffer(payload[pos:pos + n], dtype=np.uint8)


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT) — pure-Python encode/decode, stdlib+numpy
# --------------------------------------------------------------------------
# Written from the public JPEG spec (ITU-T T.81): marker segments,
# canonical Huffman tables from DHT, DC prediction chain, run-length AC
# coding, zigzag scan, 8x8 type-II DCT, byte stuffing and restart
# markers. The fixture encoder emits BLOCK-CONSTANT grayscale images:
# a constant 8x8 block has only a DC coefficient (8*(v-128), exactly a
# multiple of the DC quantizer 8), so encode→decode round-trips the
# pixel value EXACTLY and a SQL oracle can recompute decoded pixels
# straight from the generating law — same evidence pattern as the PNG
# codec (VERDICT r5 #5). The AC path (run lengths, ZRL, EOB, amplitude
# categories) is exercised by pytest vectors built from hand-chosen
# quantized coefficients against an independent naive IDCT.

JPEG_SOI = b"\xff\xd8"


def _jpeg_zigzag() -> list[int]:
    """Natural (row*8+col) index for each zigzag position, generated by
    the diagonal walk instead of a transcribed table."""
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(r, s - r) for r in rng]
        if s % 2 == 0:
            diag.reverse()  # even diagonals walk bottom-left → top-right
        order += [r * 8 + c for r, c in diag]
    return order


_JPEG_ZZ = _jpeg_zigzag()

#: quantization table in NATURAL order: DC quantizer 8 (divides 8*(v-128)
#: exactly for any v), flat 16 for AC.
_JPEG_QT_NAT = np.array([8] + [16] * 63, dtype=np.int32)


def _jpeg_dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: forward F = C f C^T, inverse
    f = C^T F C."""
    import math as _m

    c = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        scale = _m.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = scale * _m.cos((2 * x + 1) * u * _m.pi / 16)
    return c


_JPEG_DCT = _jpeg_dct_basis()


class _JpegBitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (0xFF → 0xFF00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def align_marker(self, marker: int) -> None:
        """Pad to a byte boundary with 1-bits and emit a bare marker
        (RSTn) — markers are never byte-stuffed."""
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _jpeg_category(v: int) -> tuple[int, int]:
    """(size, amplitude-bit pattern) of a DC diff / AC coefficient: size
    is the bit length of |v|; negative values store v + 2^size - 1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _jpeg_flat_huffman(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """A valid canonical Huffman table assigning every symbol the same
    code length L = ceil(log2(n+1)) — symbol i gets code i, and the
    all-ones code 2^L - 1 is never used (kept free per the spec's
    canonical construction). Returns (BITS[16], HUFFVAL, {sym: (code,
    L)}) — the decoder rebuilds the identical codes from BITS/HUFFVAL."""
    n = len(symbols)
    length = max(1, (n + 1 - 1).bit_length())  # smallest L with 2^L - 1 >= n
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    codes = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bits, list(symbols), codes


def _jpeg_quantize_blocks(width: int, height: int, pixels: bytes) -> list:
    """Forward path of the real encoder: 8x8 blocks (raster order) →
    level shift → DCT → round(F / Q). Returns int32[64] per block in
    natural order."""
    if width % 8 or height % 8:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes (grayscale)")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    qt = _JPEG_QT_NAT.reshape(8, 8).astype(np.float64)
    blocks = []
    for by in range(height // 8):
        for bx in range(width // 8):
            f = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8].astype(
                np.float64
            ) - 128.0
            coef = _JPEG_DCT @ f @ _JPEG_DCT.T
            blocks.append(
                np.rint(coef / qt).astype(np.int32).reshape(64)
            )
    return blocks


def _encode_jpeg_coeffs(
    width: int,
    height: int,
    comps: list,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Assemble a sequential JPEG from QUANTIZED coefficient blocks:
    DQT + SOF0 (SOF1 with ``precision=12`` — baseline is 8-bit only per
    T.81, so 12-bit emits the extended-sequential frame marker and a
    16-bit-entry DQT) + DHT + (DRI) + SOS + interleaved entropy-coded
    data with optional restart markers.

    ``comps`` is a list of (comp_id, h, v, blocks): blocks are int[64]
    arrays in NATURAL order, supplied in MCU-major order (for each MCU,
    the component's v*h blocks raster-wise). Separated from the pixel
    path so tests can drive the decoder with hand-chosen coefficients
    (AC runs, ZRL, EOB, subsampled components, restart chains)."""
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcux = -(-width // (8 * max_h))
    mcuy = -(-height // (8 * max_v))
    dc_syms, ac_syms, tokens = set(), set(), []
    pred = {c[0]: 0 for c in comps}
    idx = {c[0]: 0 for c in comps}

    def emit_block(cid, blk) -> None:
        zz = [int(blk[_JPEG_ZZ[i]]) for i in range(64)]
        size, ampl = _jpeg_category(zz[0] - pred[cid])
        pred[cid] = zz[0]
        dc_syms.add(size)
        tokens.append(("dc", size, ampl))
        run = 0
        for coef in zz[1:]:
            if coef == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                tokens.append(("ac", 0xF0, 0, 0))
                run -= 16
            size, ampl = _jpeg_category(coef)
            sym = (run << 4) | size
            ac_syms.add(sym)
            tokens.append(("ac", sym, ampl, size))
            run = 0
        if run:
            ac_syms.add(0x00)
            tokens.append(("ac", 0x00, 0, 0))

    mcu_count = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                tokens.append(
                    ("rst", (mcu_count // restart_interval - 1) % 8)
                )
                for cid in pred:
                    pred[cid] = 0
            for cid, h, v, blocks in comps:
                for _ in range(h * v):
                    emit_block(cid, blocks[idx[cid]])
                    idx[cid] += 1
            mcu_count += 1
    for cid, h, v, blocks in comps:
        if idx[cid] != len(blocks):
            raise ValueError(f"component {cid}: block count mismatch")

    dc_bits, dc_vals, dc_codes = _jpeg_flat_huffman(sorted(dc_syms))
    ac_bits, ac_vals, ac_codes = _jpeg_flat_huffman(sorted(ac_syms))
    bw = _JpegBitWriter()
    for tok in tokens:
        if tok[0] == "dc":
            _, size, ampl = tok
            code, length = dc_codes[size]
            bw.put(code, length)
            if size:
                bw.put(ampl, size)
        elif tok[0] == "ac":
            _, sym, ampl, size = tok
            code, length = ac_codes[sym]
            bw.put(code, length)
            if size:
                bw.put(ampl, size)
        else:  # restart marker
            bw.align_marker(0xD0 + tok[1])
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    if precision == 8:
        qt_zz = bytes(int(_JPEG_QT_NAT[_JPEG_ZZ[i]]) for i in range(64))
        dqt = seg(0xDB, b"\x00" + qt_zz)  # Pq=0 (8-bit entries), Tq=0
        sof_marker = 0xC0  # baseline
    elif precision == 12:
        qt_zz = b"".join(
            struct.pack(">H", int(_JPEG_QT_NAT[_JPEG_ZZ[i]]))
            for i in range(64)
        )
        dqt = seg(0xDB, b"\x10" + qt_zz)  # Pq=1 (16-bit entries), Tq=0
        sof_marker = 0xC1  # extended sequential (12-bit lives here)
    else:
        raise ValueError("precision must be 8 or 12")
    sof0 = seg(
        sof_marker,
        struct.pack(">BHHB", precision, height, width, len(comps))
        + b"".join(bytes([cid, (h << 4) | v, 0]) for cid, h, v, _ in comps),
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc_bits) + bytes(dc_vals)  # Tc=0 (DC), Th=0
        + b"\x10" + bytes(ac_bits) + bytes(ac_vals),  # Tc=1 (AC), Th=0
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(
        0xDA,
        bytes([len(comps)])
        + b"".join(bytes([cid, 0x00]) for cid, _, _, _ in comps)
        + bytes([0, 63, 0]),
    )
    return JPEG_SOI + dqt + sof0 + dht + dri + sos + scan + b"\xff\xd9"


def _encode_jpeg_gray_coeffs(
    width: int, height: int, blocks: list
) -> bytes:
    """Single-component wrapper (the fixture path)."""
    return _encode_jpeg_coeffs(width, height, [(1, 1, 1, blocks)])


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Baseline sequential grayscale JPEG via the REAL forward pipeline
    (level shift → 8x8 DCT → quantize → Huffman). With block-constant
    input the round trip is bit-exact (DC quantizer 8 divides the DC
    coefficient 8*(v-128) for every v) — the fixture builder mirroring
    ``encode_png``."""
    return _encode_jpeg_gray_coeffs(
        width, height, _jpeg_quantize_blocks(width, height, pixels)
    )


def _jpeg_quantize_blocks12(width: int, height: int, samples) -> list:
    """12-bit forward path: level shift 2048 → 8x8 DCT → round(F / Q).
    ``samples`` is any int sequence/array of width*height values in
    [0, 4095]. With block-constant input the round trip is bit-exact
    for the same reason as the 8-bit path (DC quantizer 8 divides
    8*(v-2048) for every v)."""
    if width % 8 or height % 8:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    img = np.asarray(samples, dtype=np.int64)
    if img.size != width * height:
        raise ValueError("samples must be width*height values")
    if img.min() < 0 or img.max() > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    img = img.reshape(height, width)
    qt = _JPEG_QT_NAT.reshape(8, 8).astype(np.float64)
    blocks = []
    for by in range(height // 8):
        for bx in range(width // 8):
            f = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8].astype(
                np.float64
            ) - 2048.0
            coef = _JPEG_DCT @ f @ _JPEG_DCT.T
            blocks.append(np.rint(coef / qt).astype(np.int32).reshape(64))
    return blocks


def encode_jpeg_gray12(width: int, height: int, samples) -> bytes:
    """12-bit extended-sequential (SOF1) grayscale JPEG — the second
    half of the round-10 "progressive/12-bit → quarantine" gap. Same
    real forward pipeline as :func:`encode_jpeg_gray` at the deeper
    bit depth; the decoder reconstructs with level shift 2048 and
    uint16 planes clipped to [0, 4095]."""
    return _encode_jpeg_coeffs(
        width,
        height,
        [(1, 1, 1, _jpeg_quantize_blocks12(width, height, samples))],
        precision=12,
    )


def _jpeg_prog_scan_tokens(
    scomp_ids: list,
    blocks_of: dict,
    block_order: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int = 0,
):
    """Token stream for ONE progressive scan (tokens: ("sym", s)
    huffman symbols, ("bits", v, n) raw bit runs). ``block_order[cid]``
    is the scan's block sequence for that component as indices into
    its MCU-major block list — the interleaved MCU order for DC scans,
    the component's own raster grid (padding blocks excluded) for the
    non-interleaved AC scans. Encodes exactly the four scan shapes the
    decoder accepts; the AC refinement emitter mirrors the public
    libjpeg ``encode_mcu_AC_refine`` structure (ZRL only while more
    newly-significant coefficients follow, pending correction bits
    flushed after each significant symbol / EOB)."""
    tokens: list = []
    syms: set = set()

    def sym(s):
        syms.add(s)
        tokens.append(("sym", s))

    def bits(v, n):
        if n:
            tokens.append(("bits", v, n))

    dc_scan = ss == 0
    refine = ah > 0
    pred = {cid: 0 for cid in scomp_ids}
    n_units = 0

    def unit_boundary():
        # T.81: restart intervals count MCUs — one interleaved step or
        # one block of a non-interleaved scan. RSTm resets the DC
        # predictors (and, in progressive AC scans, the EOB run — our
        # per-block EOBs never span a boundary, so nothing is pending).
        nonlocal n_units
        if restart_interval and n_units and n_units % restart_interval == 0:
            tokens.append(
                ("rst", (n_units // restart_interval - 1) % 8)
            )
            for c in pred:
                pred[c] = 0
        n_units += 1

    if dc_scan and not refine:  # DC first (interleaved over all comps)
        for step in zip(*(block_order[cid] for cid in scomp_ids)):
            unit_boundary()
            for cid, idxs in zip(scomp_ids, step):
                for i in idxs:
                    v = int(blocks_of[cid][i][0]) >> al  # arithmetic
                    size, ampl = _jpeg_category(v - pred[cid])
                    pred[cid] = v
                    sym(size)
                    bits(ampl, size)
    elif dc_scan:  # DC refinement: one raw bit per block, no huffman
        for step in zip(*(block_order[cid] for cid in scomp_ids)):
            unit_boundary()
            for cid, idxs in zip(scomp_ids, step):
                for i in idxs:
                    bits((int(blocks_of[cid][i][0]) >> al) & 1, 1)
    elif not refine:  # AC first: per-block runs, per-block EOB
        (cid,) = scomp_ids
        for i in block_order[cid]:
            unit_boundary()
            blk = blocks_of[cid][i]
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[_JPEG_ZZ[k]])
                t = (abs(v) >> al) * (1 if v > 0 else -1)
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    sym(0xF0)  # ZRL
                    r -= 16
                size, ampl = _jpeg_category(t)
                sym((r << 4) | size)
                bits(ampl, size)
                r = 0
            if r:
                sym(0x00)  # EOB run of exactly this block
    else:  # AC refinement
        (cid,) = scomp_ids
        for i in block_order[cid]:
            unit_boundary()
            blk = blocks_of[cid][i]
            absv = {}
            eobpos = ss - 1  # index of the LAST newly-significant coef
            for k in range(ss, se + 1):
                t = abs(int(blk[_JPEG_ZZ[k]])) >> al
                absv[k] = t
                if t == 1:
                    eobpos = k
            r = 0
            corr: list = []  # pending correction bits
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    sym(0xF0)
                    r -= 16
                    for cb in corr:
                        bits(cb, 1)
                    corr = []
                if t > 1:  # already significant: one correction bit
                    corr.append(t & 1)
                    continue
                sym((r << 4) | 1)  # newly significant
                bits(1 if int(blk[_JPEG_ZZ[k]]) > 0 else 0, 1)
                for cb in corr:
                    bits(cb, 1)
                corr = []
                r = 0
            if r > 0 or corr:
                sym(0x00)  # EOB (run of 1) + its correction bits
                for cb in corr:
                    bits(cb, 1)
    return tokens, sorted(syms)


def _encode_jpeg_progressive_coeffs(
    width: int, height: int, comps: list, al: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Progressive JPEG (SOF2) from the SAME quantized blocks the
    baseline assembler takes — only the SCAN STRUCTURE differs, so
    ``decode(progressive) == decode(baseline)`` pins the whole
    progressive machinery differentially (spectral selection,
    successive approximation, DC/AC refinement, EOB runs). Scan script:

    1. DC first, interleaved, Ah=0 Al=``al``
    2. per component: AC band 1..5 first, Al=``al``
    3. per component: AC band 6..63 first, Al=``al``
    4. for a = ``al``..1: DC refinement (interleaved, Ah=a Al=a-1),
       then per component AC refinement 1..63 (Ah=a Al=a-1)

    Sampling factors up to 2x2 are supported (4:2:0 progressive is the
    most common JPEG on the web): the interleaved DC scans walk the
    MCU-major block order — the same order the baseline assembler
    takes its blocks in — and the non-interleaved AC scans walk each
    component's OWN raster block grid, skipping the MCU padding blocks
    that only interleaved scans code (T.81 A.2.2/A.2.3)."""
    if not 1 <= al <= 13:
        raise ValueError("al must be in [1, 13]")
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcux = -(-width // (8 * max_h))
    mcuy = -(-height // (8 * max_v))
    blocks_of = {cid: blocks for cid, _, _, blocks in comps}
    # per-scan block orders as indices into the MCU-major lists:
    # DC (interleaved) — groups of the comp's h*v blocks per MCU;
    # AC (non-interleaved) — the comp's data-block raster, mapped into
    # MCU-major position, padding blocks excluded
    dc_order: dict = {}
    ac_order: dict = {}
    for cid, h, v, blocks in comps:
        if len(blocks) != mcux * mcuy * h * v:
            raise ValueError(f"component {cid}: block count mismatch")
        dc_order[cid] = [
            [i * h * v + j for j in range(h * v)]
            for i in range(mcux * mcuy)
        ]
        cw = -(-(width * h) // max_h)
        ch = -(-(height * v) // max_v)
        bw_data, bh_data = -(-cw // 8), -(-ch // 8)
        ac_order[cid] = [
            ((by // v) * mcux + (bx // h)) * (h * v) + (by % v) * h + (bx % h)
            for by in range(bh_data)
            for bx in range(bw_data)
        ]
    all_ids = [c[0] for c in comps]

    scans = [(all_ids, 0, 0, 0, al)]
    for cid in all_ids:
        scans.append(([cid], 1, 5, 0, al))
        scans.append(([cid], 6, 63, 0, al))
    for a in range(al, 0, -1):
        scans.append((all_ids, 0, 0, a, a - 1))
        for cid in all_ids:
            scans.append(([cid], 1, 63, a, a - 1))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qt_zz = bytes(int(_JPEG_QT_NAT[_JPEG_ZZ[i]]) for i in range(64))
    out = [
        JPEG_SOI,
        seg(0xDB, b"\x00" + qt_zz),
        seg(
            0xC2,
            struct.pack(">BHHB", 8, height, width, len(comps))
            + b"".join(
                bytes([cid, (h << 4) | v, 0]) for cid, h, v, _ in comps
            ),
        ),
    ]
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    for scomp_ids, ss, se, ah, a in scans:
        if ss == 0 and len(scomp_ids) > 1:
            order = dc_order  # interleaved MCU order
        elif ss == 0:
            # T.81: a single-component scan is NON-interleaved even for
            # DC — the decoder walks the data grid, so must the encoder
            c0 = scomp_ids[0]
            order = {c0: [[i] for i in ac_order[c0]]}
        else:
            order = ac_order
        tokens, syms = _jpeg_prog_scan_tokens(
            scomp_ids, blocks_of, order, ss, se, ah, a, restart_interval
        )
        codes = {}
        if syms:  # DC refinement scans carry raw bits only — no DHT
            bits16, vals, codes = _jpeg_flat_huffman(syms)
            tc = 0 if ss == 0 else 1
            out.append(
                seg(0xC4, bytes([(tc << 4) | 0]) + bytes(bits16) + bytes(vals))
            )
        out.append(
            seg(
                0xDA,
                bytes([len(scomp_ids)])
                + b"".join(bytes([cid, 0x00]) for cid in scomp_ids)
                + bytes([ss, se, (ah << 4) | a]),
            )
        )
        bw = _JpegBitWriter()
        for tok in tokens:
            if tok[0] == "sym":
                code, length = codes[tok[1]]
                bw.put(code, length)
            elif tok[0] == "rst":
                bw.align_marker(0xD0 + tok[1])
            else:
                bw.put(tok[1], tok[2])
        out.append(bw.flush())
    out.append(b"\xff\xd9")
    return b"".join(out)


def encode_jpeg_gray_progressive(
    width: int, height: int, pixels: bytes, al: int = 1
) -> bytes:
    """Progressive grayscale JPEG over the baseline forward pipeline's
    quantized blocks (see :func:`_encode_jpeg_progressive_coeffs`)."""
    return _encode_jpeg_progressive_coeffs(
        width,
        height,
        [(1, 1, 1, _jpeg_quantize_blocks(width, height, pixels))],
        al=al,
    )


def encode_jpeg_eob_scan_stream(
    n_scans: int, width: int = 256, height: int = 256
) -> bytes:
    """The scan-count rail's differential fixture (ADVICE r11 medium):
    a grayscale SOF2 stream of ``n_scans`` identical ~12-byte AC-first
    scans, each one EOB-run symbol (EOB10 under a single 1-bit Huffman
    code + 10 appended bits) covering the FULL block grid. Per scan
    the decoder walks every block for ~2 entropy bytes — the
    unbounded-work shape the rail quarantines past
    ``JPEG_MAX_DC_PASSES + JPEG_MAX_SCANS_PER_COMPONENT``; under the
    cap it decodes to the level-shift constant (all coefficients
    zero). The SINGLE builder behind both the pytest pin
    (tests/test_jpeg_progressive.py) and the junk-probe payload
    (tools/junk_check.py) — two hand-rolled copies would drift
    silently (r12 review)."""

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    scan = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + b"\x00\x1f"
    return b"".join(
        [
            JPEG_SOI,
            seg(0xDB, b"\x00" + bytes([1] * 64)),
            seg(
                0xC2,
                struct.pack(">BHHB", 8, height, width, 1)
                + bytes([1, 0x11, 0]),
            ),
            # one AC table (tc=1, th=0): a single 1-bit code for EOB10
            seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0xA0])),
        ]
        + [scan] * n_scans
        + [b"\xff\xd9"]
    )


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with byte unstuffing;
    stops at any non-RST marker and surfaces RSTn for the MCU loop."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF
                else:
                    raise ValueError("marker inside entropy data")
            self._acc, self._n = byte, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _jpeg_build_huffman(bits: list[int], vals: list[int]) -> dict:
    """Canonical JPEG Huffman reconstruction: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(br: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(ampl: int, size: int) -> int:
    """Amplitude bits → signed value (T.81 EXTEND)."""
    if size == 0:
        return 0
    return ampl if ampl >= (1 << (size - 1)) else ampl - (1 << size) + 1


def _jpeg_alloc_store(comps, width: int, height: int):
    """Validate the frame header and allocate the per-component
    coefficient store (int64[block_rows, block_cols, 64], natural
    order). The memory/CPU bomb guards are the round-8 sequential
    path's, checked BEFORE any allocation:

    - a hard sample cap — 4M samples ~ a 2048x2048 gray or 1184² RGB
      frame, ~50 MB of float64 planes worst-case and a bounded
      pure-Python block loop;
    - the per-scan entropy budget lives in :func:`_jpeg_decode_scan`
      (sequential scans only — progressive EOB runs legitimately code
      thousands of blocks per byte; progressive work is bounded by
      this sample cap TIMES the cross-scan count rail in
      :func:`_jpeg_decode_planes`, ADVICE r11).
    """
    if not (1 <= len(comps) <= 4) or width <= 0 or height <= 0:
        raise ValueError("bad SOF dimensions/components")
    if len({c[0] for c in comps}) != len(comps):
        raise ValueError("duplicate component ids")
    for _cid, h, v, _tq in comps:
        if h < 1 or v < 1:
            raise ValueError("zero sampling factor")
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    if max_h > 2 or max_v > 2:
        raise ValueError("sampling factors above 2 unsupported")
    if width * height * len(comps) > DECODE_SAMPLE_CAP:
        raise DecodeCapExceeded("image dimensions exceed decode cap")
    mcux = -(-width // (8 * max_h))
    mcuy = -(-height // (8 * max_v))
    geom = {
        "mcux": mcux,
        "mcuy": mcuy,
        "max_h": max_h,
        "max_v": max_v,
        "store_blocks": {},
        "data_blocks": {},
    }
    store = {}
    for cid, h, v, _tq in comps:
        bh, bw = mcuy * v, mcux * h
        geom["store_blocks"][cid] = (bh, bw)
        # non-interleaved scans cover the component's OWN block grid
        # (ceil of its scaled dimensions), not the MCU-padded grid
        cw = -(-(width * h) // max_h)
        ch = -(-(height * v) // max_v)
        geom["data_blocks"][cid] = (-(-ch // 8), -(-cw // 8))
        # int64, not int16/int32: a crafted DC-diff chain can drift the
        # predictor far past int16 — the store must absorb it without
        # silent wraparound (quarantine handlers never see overflow)
        store[cid] = np.zeros((bh, bw, 64), dtype=np.int64)
    return store, geom


def _jpeg_seq_block(br, blk, dc_tbl, ac_tbl, pred: int) -> int:
    """Full-band sequential block decode (DC diff + AC run-length) into
    a 64-coef natural-order view; returns the updated DC predictor."""
    size = _jpeg_huff_decode(br, dc_tbl)
    if size > 15:  # DC categories are <= 11 (8-bit) / <= 15 (12-bit);
        # a corrupt table can claim up to 255 bits and overflow the
        # int64 predictor chain
        raise ValueError("bad DC category")
    pred += _jpeg_extend(br.bits(size), size)
    blk[0] = pred
    k = 1
    while k < 64:
        sym = _jpeg_huff_decode(br, ac_tbl)
        if sym == 0x00:  # EOB
            break
        run, sz = sym >> 4, sym & 0x0F
        if sz == 0:
            if run != 15:
                raise ValueError("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        blk[_JPEG_ZZ[k]] = _jpeg_extend(br.bits(sz), sz)
        k += 1
    return pred


def _jpeg_ac_first(br, blk, ac_tbl, ss: int, se: int, al: int, state) -> None:
    """Progressive AC first scan for one block (T.81 G.1.2.2): run
    lengths within the [ss, se] band, values point-transformed left by
    ``al``, EOB-run symbols covering up to 2^14 following blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = _jpeg_huff_decode(br, ac_tbl)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r != 15:
                eob = 1 << r
                if r:
                    eob += br.bits(r)
                state["eobrun"] = eob - 1  # this block is the first
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        blk[_JPEG_ZZ[k]] = _jpeg_extend(br.bits(s), s) << al
        k += 1


def _jpeg_ac_refine(br, blk, ac_tbl, ss: int, se: int, al: int, state) -> None:
    """Progressive AC refinement scan for one block (T.81 G.1.2.3).
    Control flow mirrors the public libjpeg ``decode_mcu_AC_refine``:
    newly-significant coefficients arrive as (run, 1) symbols whose run
    counts ZERO-HISTORY positions only, while every already-nonzero
    coefficient passed on the way consumes one correction bit; EOB runs
    finish the block (and following blocks) with correction bits for
    their remaining nonzero coefficients."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = _jpeg_huff_decode(br, ac_tbl)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eob = 1 << r
                    if r:
                        eob += br.bits(r)
                    state["eobrun"] = eob
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                val = p1 if br.bit() else m1
            while k <= se:
                z = _JPEG_ZZ[k]
                if blk[z] != 0:
                    if br.bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] > 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                blk[_JPEG_ZZ[k]] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = _JPEG_ZZ[k]
            if blk[z] != 0:
                if br.bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] > 0 else m1
            k += 1
        state["eobrun"] -= 1


def _jpeg_decode_scan(
    br,
    store,
    geom,
    comps_by_id,
    scomps,
    huff_dc,
    huff_ac,
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    restart_interval: int,
    payload_len: int,
) -> None:
    """Decode one entropy-coded scan into the coefficient store.

    Sequential scans are full-band (interleaved MCU order when the
    scan names several components, the component's own block grid when
    it names one). Progressive scans dispatch on (band, Ah): DC first /
    DC refinement (interleaving allowed), AC first / AC refinement
    (single-component per T.81). Restart markers reset DC predictors
    AND the EOB run."""
    ns = len(scomps)
    if progressive:
        if ss == 0:
            if se != 0:
                raise ValueError("bad progressive DC band")
        else:
            if ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            if not (ss <= se <= 63):
                raise ValueError("bad spectral band")
        if ah > 13 or al > 13 or (ah and ah != al + 1):
            raise ValueError("bad successive-approximation bits")
    else:
        if ss != 0 or se != 63 or ah or al:
            raise ValueError("bad sequential scan header")
    dc_scan = ss == 0
    refine = progressive and ah > 0
    # cross-reference validation: a corrupt file can name tables that
    # were never defined — every dangling reference must quarantine,
    # not KeyError. DC refinement reads raw bits (no table at all).
    need_dc = (not progressive) or (dc_scan and not refine)
    need_ac = (not progressive) or not dc_scan
    for _cid, td, ta in scomps:
        if need_dc and td not in huff_dc:
            raise ValueError("undefined DC Huffman table")
        if need_ac and ta not in huff_ac:
            raise ValueError("undefined AC Huffman table")
    if not progressive:
        # CPU-bomb guard: each sequential 8x8 block consumes >= 2
        # entropy bits (1-bit DC code + 1-bit EOB are the Huffman
        # minima), so a well-formed scan never codes more than 4
        # blocks per byte. Progressive scans are exempt: one EOB-run
        # symbol legitimately covers up to 2^14 blocks — their total
        # work is bounded by the sample cap x the cross-scan count
        # rail in _jpeg_decode_planes (ADVICE r11) instead.
        if ns == 1:
            bh, bw = geom["data_blocks"][scomps[0][0]]
            total_blocks = bh * bw
        else:
            total_blocks = geom["mcux"] * geom["mcuy"] * sum(
                comps_by_id[c][1] * comps_by_id[c][2] for c, _, _ in scomps
            )
        if total_blocks > 4 * max(payload_len - br.pos, 1):
            raise ValueError("SOF block count exceeds entropy data budget")

    state = {"eobrun": 0}
    pred = {cid: 0 for cid, _, _ in scomps}

    def decode_block(blk, td, ta, cid):
        if not progressive:
            pred[cid] = _jpeg_seq_block(
                br, blk, huff_dc[td], huff_ac[ta], pred[cid]
            )
        elif dc_scan and not refine:
            size = _jpeg_huff_decode(br, huff_dc[td])
            if size > 15:
                raise ValueError("bad DC category")
            pred[cid] += _jpeg_extend(br.bits(size), size)
            blk[0] = pred[cid] << al
        elif dc_scan:  # DC refinement: one raw bit, OR'd in at Al
            if br.bit():
                blk[0] |= 1 << al
        elif not refine:
            _jpeg_ac_first(br, blk, huff_ac[ta], ss, se, al, state)
        else:
            _jpeg_ac_refine(br, blk, huff_ac[ta], ss, se, al, state)

    def do_restart():
        br.sync_restart()
        for c in pred:
            pred[c] = 0
        state["eobrun"] = 0

    n = 0
    if ns == 1:
        cid, td, ta = scomps[0]
        bh, bw = geom["data_blocks"][cid]
        blocks = store[cid]
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and n and n % restart_interval == 0:
                    do_restart()
                decode_block(blocks[by, bx], td, ta, cid)
                n += 1
    else:
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                if restart_interval and n and n % restart_interval == 0:
                    do_restart()
                for cid, td, ta in scomps:
                    _, h, v, _ = comps_by_id[cid]
                    blocks = store[cid]
                    for by in range(v):
                        for bx in range(h):
                            decode_block(
                                blocks[my * v + by, mx * h + bx], td, ta, cid
                            )
                n += 1


#: ADVICE r11 (medium): progressive scans are exempt from the per-scan
#: entropy budget (one EOB-run symbol legitimately codes up to 2^14
#: blocks), so WITHOUT a scan-count rail a crafted SOF2 file of
#: repeated ~34-byte EOB-run scans forces a full block-grid walk per
#: scan — measured ~6.5 ms/scan at 1024x1024, i.e. ~10 CPU-minutes per
#: MB of payload at the sample cap, an executor-stall DoS that never
#: raises (the quarantine handlers never fire because decode
#: succeeds). Rail: a legitimate T.81 scan script must code at least
#: one new (coefficient, approximation-bit) cell per scan, so it is
#: bounded by 64 coefficients x 14 bits per component; real encoders
#: emit <= ~20 scans, and libjpeg-turbo's mitigation for this same
#: attack (djpeg -maxscans) recommends 100. 64/component + 14
#: interleaved DC passes is generous for every legitimate file and
#: bounds total decode work at cap x block-grid (~200 scans x 64k
#: blocks ~ 1-2 s worst case at the sample cap, vs unbounded before).
JPEG_MAX_SCANS_PER_COMPONENT = 64
JPEG_MAX_DC_PASSES = 14


def _jpeg_decode_planes(payload: bytes):
    """Full JPEG decode in the coefficient domain: baseline sequential
    (SOF0), extended sequential (SOF1 — 8- and 12-bit), and progressive
    (SOF2: spectral selection + successive approximation, DC/AC
    refinement scans, EOB runs) — the round-10 "progressive/12-bit →
    quarantine" gap, closed. Returns (planes, width, height) with one
    full-resolution uint8 (uint16 for 12-bit) plane per component
    (chroma planes of subsampled images are replicated up). Supports
    1- and 3-component scans, sampling factors up to 2x2 (4:4:4 /
    4:2:0 / 4:2:2), multiple DQT/DHT segments (Huffman tables may be
    redefined between scans; each component's QUANT table is latched
    at its first SOS — libjpeg semantics, see below), restart
    intervals in sequential AND progressive scans, byte stuffing.
    Lossless / arithmetic / hierarchical processes are rejected →
    quarantine. Two cross-scan rails (ADVICE r11): total scan count is
    capped (``JPEG_MAX_SCANS_PER_COMPONENT`` — the EOB-run-scan DoS),
    and DQT redefinition between scans does NOT retroactively
    re-quantize earlier scans' coefficients — dequantization uses the
    table in effect at the component's first SOS, matching libjpeg's
    latch-at-first-scan behavior instead of last-writer-wins.

    Every scan decodes into a per-component int64 coefficient store;
    reconstruction (dequantize + batched IDCT + level shift) runs ONCE
    at the end — a sequential file and a progressive file carrying the
    same quantized coefficients therefore decode to IDENTICAL planes,
    which tests/test_jpeg_progressive.py pins differentially (the
    progressive fixture encoder reuses the baseline's quantized
    blocks, changing only the scan structure)."""
    if payload[:2] != JPEG_SOI:
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of (id, h, v, tq)
    width = height = 0
    precision = 8
    progressive = False
    restart_interval = 0
    store = None
    geom = None
    scans_done = 0
    latched_qt: dict[int, np.ndarray] = {}  # comp id -> first-SOS DQT
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT — pq=0 (8-bit) or pq=1 (16-bit entries)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq not in (0, 1):
                    raise ValueError("bad DQT precision")
                n = 64 * (pq + 1)
                raw = body[b + 1:b + 1 + n]
                if len(raw) != n:
                    raise ValueError("truncated DQT")
                zz = np.frombuffer(
                    raw, dtype=">u2" if pq else np.uint8
                ).astype(np.int32)
                nat = np.zeros(64, dtype=np.int32)
                for i in range(64):
                    nat[_JPEG_ZZ[i]] = zz[i]
                qts[tq] = nat
                b += 1 + n
        elif marker == 0xC4:  # DHT — may arrive/redefine between scans
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("truncated DHT")
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                (huff_ac if tc else huff_dc)[th] = _jpeg_build_huffman(
                    bits, vals
                )
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if comps is not None:
                raise ValueError("multiple SOF segments")
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            progressive = marker == 0xC2
            if precision not in (8, 12):
                raise ValueError("unsupported JPEG sample precision")
            if precision == 12 and marker == 0xC0:
                raise ValueError("baseline JPEG is 8-bit only")
            if len(body) < 6 + ncomp * 3:
                raise ValueError("truncated SOF")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + c * 3:9 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (
            0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
        ):
            raise ValueError("unsupported JPEG coding process")
        elif marker == 0xDD:  # DRI — may change between scans
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode this scan's entropy data
            if comps is None:
                raise ValueError("SOS before SOF")
            if store is None:
                store, geom = _jpeg_alloc_store(comps, width, height)
            ns = body[0] if body else 0
            if ns < 1 or len(body) != 1 + 2 * ns + 3:
                raise ValueError("bad SOS header")
            known = {c[0]: c for c in comps}
            scomps = []
            for c in range(ns):
                cid, tdta = body[1 + c * 2], body[2 + c * 2]
                if cid not in known:
                    raise ValueError("SOS names unknown component")
                scomps.append((cid, tdta >> 4, tdta & 0x0F))
            if len({c[0] for c in scomps}) != ns:
                raise ValueError("duplicate component in SOS")
            # scan-count rail (ADVICE r11): bound TOTAL entropy-scan
            # work — progressive scans are exempt from the per-scan
            # entropy budget, so without this cap a stream of tiny
            # EOB-run scans walks the full block grid unboundedly
            if scans_done >= (
                JPEG_MAX_DC_PASSES
                + JPEG_MAX_SCANS_PER_COMPONENT * len(comps)
            ):
                raise ValueError("too many JPEG scans")
            # DQT latch (ADVICE r11): each component's quant table is
            # fixed at its FIRST SOS — a mid-stream DQT redefinition
            # must not retroactively re-quantize coefficients decoded
            # under the earlier table (libjpeg latches identically)
            for cid, _td, _ta in scomps:
                if cid not in latched_qt:
                    tq = known[cid][3]
                    if tq not in qts:
                        raise ValueError("undefined quant table")
                    latched_qt[cid] = qts[tq]
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            br = _JpegBitReader(payload, pos + 2 + seglen)
            _jpeg_decode_scan(
                br, store, geom, known, scomps, huff_dc, huff_ac,
                ss, se, ahal >> 4, ahal & 0x0F, progressive,
                restart_interval, len(payload),
            )
            scans_done += 1
            pos = br.pos
            continue
        pos += 2 + seglen
    if comps is None:
        raise ValueError("missing SOF")
    if scans_done == 0:
        raise ValueError("no scan data")
    for cid, _h, _v, tq in comps:
        # a component that never appeared in any SOS has no latched
        # table (its coefficients are all zero); it dequantizes under
        # the final table state, preserving the pre-latch validation
        if cid not in latched_qt:
            if tq not in qts:
                raise ValueError("undefined quant table")
            latched_qt[cid] = qts[tq]

    maxval = (1 << precision) - 1
    shift = float(1 << (precision - 1))
    out = []
    max_h, max_v = geom["max_h"], geom["max_v"]
    for cid, h, v, _tq in comps:
        bh, bw = geom["store_blocks"][cid]
        deq = (
            (store[cid] * latched_qt[cid].astype(np.int64))
            .reshape(bh, bw, 8, 8)
            .astype(np.float64)
        )
        # batched IDCT: np.matmul broadcasts the same per-block 2-D
        # multiplies the old per-block loop did — bit-identical floats
        blk = _JPEG_DCT.T @ deq @ _JPEG_DCT + shift
        plane = blk.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        p = np.clip(np.rint(plane), 0, maxval).astype(
            np.uint8 if precision == 8 else np.uint16
        )
        # replicate subsampled chroma up to full MCU resolution…
        if h < max_h:
            p = np.repeat(p, max_h // h, axis=1)
        if v < max_v:
            p = np.repeat(p, max_v // v, axis=0)
        # …then crop the MCU padding
        out.append(p[:height, :width])
    return out, int(width), int(height)


def decode_jpeg(payload: bytes) -> dict:
    """Feature contract over a real baseline JPEG decode — same shape as
    the other decoders (exact integer checksum over decoded samples, all
    components at full resolution)."""
    planes, width, height = _jpeg_decode_planes(payload)
    total = sum(int(p.astype(np.int64).sum()) for p in planes)
    n = sum(int(p.size) for p in planes)
    return {
        "format": "jpeg",
        "width": width,
        "height": height,
        "n_elements": n,
        "content_checksum": total,
    }


def encode_jfif_app0(
    xdensity: int = 72,
    ydensity: int = 72,
    units: int = 1,
    version: tuple[int, int] = (1, 2),
) -> bytes:
    """A spec-exact JFIF APP0 segment (JFIF 1.02 §JFIF APP0 marker):
    marker, length 16, 'JFIF\\0', version, density units (0 aspect
    only / 1 dpi / 2 dpcm), X/Y density, 0x0 thumbnail."""
    return (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00"
        + bytes(version)
        + struct.pack(">BHHBB", units, xdensity, ydensity, 0, 0)
    )


def encode_exif_app1(orientation: int = 1, big_endian: bool = False) -> bytes:
    """A minimal spec-exact EXIF APP1 segment: 'Exif\\0\\0', TIFF header
    (byte order, magic 42, IFD0 at offset 8), one-entry IFD0 carrying
    tag 0x0112 Orientation (SHORT, count 1), next-IFD pointer 0."""
    e = ">" if big_endian else "<"
    order = b"MM" if big_endian else b"II"
    tiff = (
        order
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)  # IFD0 offset
        + struct.pack(e + "H", 1)  # one entry
        # tag, type SHORT, count, value left-justified in 4 bytes
        + struct.pack(e + "HHI", 0x0112, 3, 1)
        + struct.pack(e + "H", orientation)
        + b"\x00\x00"
        + struct.pack(e + "I", 0)  # no next IFD
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def jpeg_app_metadata(payload: bytes) -> dict:
    """APP-segment metadata walk (verdict r6 #6): JFIF APP0 density /
    version and the EXIF APP1 Orientation tag ONLY (a one-entry IFD0
    scan with spec-offset bounds, deliberately not a full TIFF walk —
    the MP4 box-walker discipline). Returns
    {jfif_version, density_units, xdensity, ydensity, orientation},
    each None when its segment is absent. Malformed structures that
    CLAIM to be JFIF/EXIF quarantine with ValueError: JFIF bodies
    shorter than the 14-byte spec floor, zero densities (forbidden by
    JFIF §X/Ydensity), unit codes above 2, TIFF headers with a bad
    byte order or magic, IFD offsets/entry tables escaping the
    segment, orientation values outside 1..8."""
    if payload[:2] != JPEG_SOI:
        raise ValueError("not a JPEG payload")
    out: dict = {
        "jfif_version": None,
        "density_units": None,
        "xdensity": None,
        "ydensity": None,
        "orientation": None,
    }
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them instead of misreading 0xFF as a
        # marker whose "length" is the next two bytes (ADVICE r7)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker in (0xDA, 0xD9):  # scan data / EOI: APPn all seen
            break
        # standalone markers carry NO length field (T.81 table B.1):
        # TEM (0x01) and RSTn (0xD0-0xD7) are spec-legal before SOS —
        # treating their following bytes as a length misparsed valid
        # files into quarantine (ADVICE r7)
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xE0 and body[:5] == b"JFIF\x00":
            if len(body) < 14:
                raise ValueError("JFIF APP0 below 14-byte spec floor")
            major, minor, units, xd, yd = struct.unpack(
                ">BBBHH", body[5:12]
            )
            if units > 2:
                raise ValueError("JFIF density unit above 2")
            if xd == 0 or yd == 0:
                raise ValueError("JFIF zero density forbidden")
            out["jfif_version"] = f"{major}.{minor:02d}"
            out["density_units"] = units
            out["xdensity"] = xd
            out["ydensity"] = yd
        elif marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            if len(tiff) < 8:
                raise ValueError("EXIF TIFF header truncated")
            if tiff[:2] == b"II":
                e = "<"
            elif tiff[:2] == b"MM":
                e = ">"
            else:
                raise ValueError("EXIF bad TIFF byte order")
            (magic,) = struct.unpack_from(e + "H", tiff, 2)
            if magic != 42:
                raise ValueError("EXIF bad TIFF magic")
            (ifd0,) = struct.unpack_from(e + "I", tiff, 4)
            if ifd0 < 8 or ifd0 + 2 > len(tiff):
                raise ValueError("EXIF IFD0 offset out of bounds")
            (n_entries,) = struct.unpack_from(e + "H", tiff, ifd0)
            if ifd0 + 2 + 12 * n_entries > len(tiff):
                raise ValueError("EXIF IFD0 entry table truncated")
            for i in range(n_entries):
                off = ifd0 + 2 + 12 * i
                tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, off)
                if tag == 0x0112:
                    if typ != 3 or cnt != 1:
                        raise ValueError("EXIF orientation not SHORT[1]")
                    (orient,) = struct.unpack_from(e + "H", tiff, off + 8)
                    if not 1 <= orient <= 8:
                        raise ValueError("EXIF orientation outside 1..8")
                    out["orientation"] = orient
        pos += 2 + seglen
    return out


def jpeg_fixture_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic COMPRESSED-grayscale corpus: every non-empty doc
    becomes a 16x16 baseline JPEG of four 8x8 CONSTANT blocks whose
    values are ``(cp_j * 7) % 256`` for the first four text codepoints
    (cycled) — the PNG fixture's pixel law, but round-tripped through
    DCT + quantization + Huffman coding. Block-constant input makes the
    lossy pipeline exact (only the DC coefficient is nonzero and the DC
    quantizer divides it), so the oracle recomputes decoded pixels from
    the codepoints without ever seeing the entropy stream."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:
                    continue
                cps = np.frombuffer(
                    text.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                vals = (np.resize(cps, 4) * 7) % 256
                img = np.zeros((16, 16), dtype=np.uint8)
                for b, v in enumerate(vals):
                    by, bx = divmod(b, 2)
                    img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = v
                ids.append(int(doc_id))
                payloads.append(encode_jpeg_gray(16, 16, img.tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "kind": ["image"] * len(ids),
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


GRAY_HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("bucket", LongType(), True),
        StructField("n_pixels", LongType(), True),
    ]
)


def jpeg_gray_histogram(df: DataFrame, bucket_width: int = 32) -> DataFrame:
    """Pixel-intensity histogram over REAL-decoded grayscale JPEGs —
    the single-plane sibling of ``image_channel_histogram``. Corrupt /
    non-JPEG payloads are skipped (quarantine). Map-only Arrow stage."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, buckets, counts = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    planes, _, _ = _jpeg_decode_planes(bytes(payload))
                except (ValueError, struct.error, IndexError):
                    continue
                if len(planes) != 1:
                    continue
                bk = planes[0].reshape(-1).astype(np.int64) // bucket_width
                uniq, cnt = np.unique(bk, return_counts=True)
                for k, c in zip(uniq, cnt):
                    ids.append(int(media_id))
                    buckets.append(int(k))
                    counts.append(int(c))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "bucket": pd.array(buckets, dtype="Int64"),
                    "n_pixels": pd.array(counts, dtype="Int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(kernel, GRAY_HIST_SCHEMA)


# --------------------------------------------------------------------------
# MP4 — ISO BMFF box-level metadata (moov/mvhd/tkhd), stdlib struct only
# --------------------------------------------------------------------------


def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def encode_mp4_meta(
    width: int, height: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """Minimal ISO BMFF container carrying REAL movie metadata: ftyp +
    moov(mvhd + trak(tkhd)) + empty mdat. Durations are stored in
    ``timescale`` units and dimensions as 16.16 fixed point, exactly as
    a camera/ffmpeg writes them — the fixture builder for the box
    parser."""
    duration = duration_ms * timescale // 1000
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(
            ">BxxxIIII", 0, 0, 0, timescale, duration
        )  # version 0, ctime/mtime 0
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">BBBBIIIxxxxI", 0, 0, 0, 7, 0, 0, 1, duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">hhhxx", 0, 0, 0)  # layer, alt group, volume
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    return ftyp + moov + _mp4_box(b"mdat", b"")


def _mp4_walk(payload: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack(">Q", payload[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("bad MP4 box size")
        yield tag, pos + hdr, pos + size
        pos += size


def decode_mp4_meta(payload: bytes) -> dict:
    """Movie-level metadata from the box tree: duration (mvhd
    timescale-normalized to ms, integer div) and the first track's
    16.16 fixed-point dimensions (tkhd). No sample data is touched —
    this is the cheap metadata scan a video pipeline runs before
    deciding what to feed the expensive frame decoder."""
    timescale = duration = width = height = None
    for tag, bs, be in _mp4_walk(payload, 0, len(payload)):
        if tag != b"moov":
            continue
        for t2, b2s, b2e in _mp4_walk(payload, bs, be):
            if t2 == b"mvhd":
                if b2e - b2s < 4:
                    raise ValueError("truncated mvhd")
                version = payload[b2s]
                # Spec body sizes: v0 = 100 bytes, v1 = 112 bytes.
                if version == 1:
                    if b2e - b2s < 112:
                        raise ValueError("truncated mvhd v1")
                    timescale, duration = struct.unpack(
                        ">IQ", payload[b2s + 20:b2s + 32]
                    )
                else:
                    if b2e - b2s < 100:
                        raise ValueError("truncated mvhd v0")
                    _, _, timescale, duration = struct.unpack(
                        ">IIII", payload[b2s + 4:b2s + 20]
                    )
            elif t2 == b"trak" and width is None:
                for t3, b3s, b3e in _mp4_walk(payload, b2s, b2e):
                    if t3 == b"tkhd":
                        if b3e - b3s < 4:
                            raise ValueError("truncated tkhd")
                        # Spec body sizes: v0 = 84 bytes, v1 = 96 bytes;
                        # width/height are the LAST 8 bytes of the spec
                        # body — slice at the spec offset so a short or
                        # padded box quarantines instead of reading
                        # header/sibling bytes.
                        need = 96 if payload[b3s] == 1 else 84
                        if b3e - b3s < need:
                            raise ValueError("truncated tkhd body")
                        w_fx, h_fx = struct.unpack(
                            ">II", payload[b3s + need - 8:b3s + need]
                        )
                        width, height = w_fx >> 16, h_fx >> 16
    if timescale is None or not timescale:
        raise ValueError("missing/invalid mvhd")
    return {
        "format": "mp4",
        "width": int(width) if width is not None else None,
        "height": int(height) if height is not None else None,
        "duration_ms": int(duration * 1000 // timescale),
    }


MP4_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def mp4_fixture_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic MP4 corpus: every non-empty doc becomes a minimal
    ISO BMFF file whose duration/dims derive from the first three text
    codepoints (cycled): duration_ms = (cp0*531) % 600000, width =
    (cp1*3) % 640 + 16, height = (cp2*5) % 480 + 16 — laws a SQL oracle
    recomputes from ``text`` directly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:
                    continue
                cps = np.frombuffer(
                    text.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                c = np.resize(cps, 3)
                ids.append(int(doc_id))
                payloads.append(
                    encode_mp4_meta(
                        int((c[1] * 3) % 640 + 16),
                        int((c[2] * 5) % 480 + 16),
                        int((c[0] * 531) % 600000),
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "kind": ["video"] * len(ids),
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


def mp4_metadata_scan(df: DataFrame) -> DataFrame:
    """Box-parse metadata over real MP4 payloads via Arrow mapInPandas;
    corrupt payloads are skipped (quarantine)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ds = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    meta = decode_mp4_meta(bytes(payload))
                except (ValueError, struct.error, IndexError):
                    continue
                ids.append(int(media_id))
                ws.append(meta["width"])
                hs.append(meta["height"])
                ds.append(meta["duration_ms"])
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "duration_ms": pd.array(ds, dtype="Int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(kernel, MP4_META_SCHEMA)
