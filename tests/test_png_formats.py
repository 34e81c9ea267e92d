"""PNG beyond 8-bit non-interlaced RGB (round 12): the full RFC 2083
still-image matrix — colour types 0/2/3/4/6 at their legal bit depths,
null AND Adam7 interlace, PLTE expansion.

The load-bearing idea is the progressive-JPEG strategy applied to PNG:
``encode_png_ex`` re-encodes the SAME pixels in a different physical
layout (palette indices, bit-packed depths, Adam7 pass structure) and
the decoder must land on the identical raster — so every new code path
(per-pass unfiltering, bit unpacking, sample scattering, palette
lookup) is pinned against the already-oracle-verified RGB8 path
(media_png_histogram verifies the RGB8 decode against DuckDB at sf0.01
every round). No image library exists in this container, so
cross-decoder validation against libpng/PIL is environmental; the pass
grids and filter laws implement RFC 2083 §2.6/§6 directly.
"""

import random
import struct
import zlib

import numpy as np
import pytest

from yandex_tracker_exporter_spark import multimodal as mm


def _rgb16_image(w, h, n_colors, seed):
    """(rgb_flat, idx_flat, palette) with <= n_colors distinct colors."""
    rng = random.Random(seed)
    pal = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(n_colors)
    ]
    idx = [rng.randrange(n_colors) for _ in range(w * h)]
    rgb = [c for i in idx for c in pal[i]]
    return rgb, idx, pal


def test_palette_and_adam7_decode_identically_to_rgb():
    """One image, five physical layouts (plain RGB, Adam7 RGB, palette
    at depths 8/4/2, Adam7 palette) — identical rasters."""
    w, h = 13, 9
    rgb, idx, pal = _rgb16_image(w, h, 4, seed=1)
    want = mm._png_raster(mm.encode_png_ex(w, h, rgb))
    variants = [
        mm.encode_png_ex(w, h, rgb, interlace=1),
        mm.encode_png_ex(w, h, idx, color_type=3, bit_depth=8, palette=pal),
        mm.encode_png_ex(w, h, idx, color_type=3, bit_depth=4, palette=pal),
        mm.encode_png_ex(w, h, idx, color_type=3, bit_depth=2, palette=pal),
        mm.encode_png_ex(
            w, h, idx, color_type=3, bit_depth=2, interlace=1, palette=pal
        ),
    ]
    for i, payload in enumerate(variants):
        assert np.array_equal(want, mm._png_raster(payload)), i
    # non-vacuous: the physical streams really differ
    assert len({bytes(v) for v in variants}) == len(variants)


@pytest.mark.parametrize(
    "ct,depth",
    [(0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
     (2, 8), (2, 16), (3, 1), (3, 2), (3, 4), (3, 8),
     (4, 8), (4, 16), (6, 8), (6, 16)],
)
@pytest.mark.parametrize("interlace", [0, 1])
def test_full_colour_matrix_round_trips(ct, depth, interlace):
    """Every legal (colour type, bit depth) combination round-trips
    through encode_png_ex -> _png_raster under both interlace methods,
    and decode_png's checksum law (exact integer sum) holds."""
    rng = random.Random(depth * 100 + ct * 10 + interlace)
    w, h = 11, 7  # odd dims: every Adam7 pass is ragged
    ch = mm._PNG_CHANNELS[ct]
    pal = None
    if ct == 3:
        n = min(1 << depth, 7)
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(n)
        ]
        samples = [rng.randrange(n) for _ in range(w * h)]
        flat_expect = [c for i in samples for c in pal[i]]
    else:
        samples = [rng.randrange(1 << depth) for _ in range(w * h * ch)]
        flat_expect = samples
    payload = mm.encode_png_ex(
        w, h, samples, color_type=ct, bit_depth=depth,
        interlace=interlace, palette=pal,
    )
    raster = mm._png_raster(payload)
    assert list(raster) == flat_expect
    assert raster.dtype == (np.uint16 if depth == 16 else np.uint8)
    d = mm.decode_png(payload)
    assert d["width"] == w and d["height"] == h
    assert d["n_elements"] == len(flat_expect)
    assert d["content_checksum"] == sum(flat_expect)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (4, 4), (5, 5), (8, 8),
                                 (9, 10), (3, 17)])
def test_adam7_small_images_with_empty_passes(w, h):
    """Adam7 on images smaller than the 8x8 pass grid: empty passes
    contribute NO bytes (not even filter bytes) and the scatter still
    reconstructs exactly — 1x1 uses only pass 1, 2x2 passes 1/6/7, etc."""
    rng = random.Random(w * 31 + h)
    rgb = [rng.randrange(256) for _ in range(w * h * 3)]
    plain = mm.encode_png_ex(w, h, rgb)
    inter = mm.encode_png_ex(w, h, rgb, interlace=1)
    assert np.array_equal(mm._png_raster(plain), mm._png_raster(inter))
    # the pass accounting really differs from the null layout
    n_passes = len(mm._png_passes(w, h, 1))
    # 1x1: pass 1 only; 2x2: passes 1/6/7; 4x4: passes 2 and 3 start
    # past the image (x0=4 / y0=4) and contribute nothing
    assert n_passes == {(1, 1): 1, (2, 2): 3, (4, 4): 5}.get(
        (w, h), n_passes
    )


def test_interlaced_fixture_exercises_every_filter():
    """The fixture's global-line %5 filter cycle must place all five
    filter types inside an Adam7 stream (otherwise the differential
    pins would never touch Average/Paeth in per-pass position)."""
    rgb = [i % 256 for i in range(16 * 16 * 3)]
    payload = mm.encode_png_ex(16, 16, rgb, interlace=1)
    # inflate the IDAT directly and read the leading filter byte of
    # every scanline of every pass
    pos, idat = 8, bytearray()
    while pos + 12 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8:pos + 8 + size]
        pos += 12 + size
    raw = zlib.decompress(bytes(idat))
    seen, off = set(), 0
    for x0, y0, dx, dy, w_p, h_p in mm._png_passes(16, 16, 1):
        stride = (w_p * 3 * 8 + 7) // 8
        for r in range(h_p):
            seen.add(raw[off + r * (stride + 1)])
        off += (stride + 1) * h_p
    assert off == len(raw)
    assert seen == {0, 1, 2, 3, 4}


def test_png_error_shapes_are_typed():
    """Malformed non-RGB8 shapes quarantine with typed ValueErrors:
    out-of-range palette index, missing/oversized PLTE, illegal
    colour-type/depth combos, unknown interlace method — and the
    memory-bomb laws (dimension cap BEFORE inflate, inflate output
    bound) hold for the new types too."""
    w, h = 4, 3
    rgb, idx, pal = _rgb16_image(w, h, 4, seed=2)

    # palette index beyond PLTE
    bad_idx = list(idx)
    bad_idx[0] = 3
    p = mm.encode_png_ex(
        w, h, bad_idx, color_type=3, bit_depth=8, palette=pal[:3]
    )
    with pytest.raises(ValueError, match="palette index out of range"):
        mm._png_raster(p)

    # PLTE missing: strip the chunk
    p = bytearray(
        mm.encode_png_ex(w, h, idx, color_type=3, bit_depth=8, palette=pal)
    )
    i = bytes(p).index(b"PLTE") - 4
    (size,) = struct.unpack(">I", p[i:i + 4])
    del p[i:i + 12 + size]
    with pytest.raises(ValueError, match="palette PNG without PLTE"):
        mm._png_raster(bytes(p))

    # PLTE larger than the bit depth allows (depth 2 -> max 4 entries)
    p = mm.encode_png_ex(
        w, h, [i % 4 for i in idx], color_type=3, bit_depth=2,
        palette=pal + pal[:1],
    )
    with pytest.raises(ValueError, match="PLTE larger"):
        mm._png_raster(p)

    # illegal combo (RGB at depth 4) and unknown interlace method
    good = mm.encode_png_ex(w, h, rgb)

    def with_ihdr(depth=8, ct=2, interlace=0):
        b = bytearray(good)
        b[24], b[25], b[28] = depth, ct, interlace
        body = bytes(b[16:29])
        struct.pack_into(
            ">I", b, 29, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
        )
        return bytes(b)

    with pytest.raises(ValueError, match="illegal PNG colour-type"):
        mm._png_raster(with_ihdr(depth=4))
    with pytest.raises(ValueError, match="interlace"):
        mm._png_raster(with_ihdr(interlace=2))

    # 16-bit doubles the per-sample memory, so the dimension cap must
    # bind at HALF the 8-bit pixel budget (cap law counts bytes)
    cap_px = mm.DECODE_SAMPLE_CAP // 3  # 8-bit RGB pixel budget
    b = bytearray(mm.encode_png_ex(4, 3, [0] * 4 * 3 * 3, bit_depth=8))
    side = int((cap_px // 2) ** 0.5) + 1  # fits 8-bit, busts 16-bit
    struct.pack_into(">II", b, 16, side, side)
    b[24] = 16
    body = bytes(b[16:29])
    struct.pack_into(">I", b, 29, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(mm.DecodeCapExceeded):
        mm._png_raster(bytes(b))

    # inflate bound: an interlaced stream with one extra byte past the
    # pass accounting must fail the declared-raster law
    inter = mm.encode_png_ex(w, h, rgb, interlace=1)
    pos, raw = 8, None
    bb = bytearray(inter)
    while pos + 12 <= len(bb):
        (size,) = struct.unpack(">I", bb[pos:pos + 4])
        if bb[pos + 4:pos + 8] == b"IDAT":
            raw = zlib.decompress(bytes(bb[pos + 8:pos + 8 + size]))
            new = zlib.compress(raw + b"\x00")
            bb[pos:pos + 12 + size] = mm._png_chunk(b"IDAT", new)
            break
        pos += 12 + size
    with pytest.raises(ValueError, match="past the declared raster"):
        mm._png_raster(bytes(bb))


def test_new_png_shapes_flow_through_decode_media(spark):
    """Spark-side integration: palette + Adam7 + 16-bit payloads run
    through the Arrow-batched decode_media with the same feature
    contract (format/width/height/checksum), alongside an RGB8 control
    — and a palette-index-out-of-range payload quarantines as
    malformed instead of poisoning the batch."""
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    w, h = 5, 4
    rgb, idx, pal = _rgb16_image(w, h, 4, seed=3)
    g16 = [((i * 257) % 65536) for i in range(w * h)]
    bad_idx = [3] * (w * h)
    rows = [
        (0, mm.encode_png(w, h, bytes(rgb))),
        (1, mm.encode_png_ex(w, h, rgb, interlace=1)),
        (2, mm.encode_png_ex(w, h, idx, color_type=3, bit_depth=4,
                             palette=pal)),
        (3, mm.encode_png_ex(w, h, g16, color_type=0, bit_depth=16)),
        (4, mm.encode_png_ex(w, h, bad_idx, color_type=3, bit_depth=8,
                             palette=pal[:3])),
    ]
    df = spark.createDataFrame(
        rows,
        StructType([
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]),
    )
    got = {r["media_id"]: r for r in mm.decode_media(df).collect()}
    assert got[0]["content_checksum"] == sum(rgb)
    assert got[1]["content_checksum"] == sum(rgb)
    assert got[2]["content_checksum"] == sum(rgb)
    assert got[3]["content_checksum"] == sum(g16)
    assert got[3]["n_elements"] == w * h
    # the malformed palette payload decodes to nulls, poisoning nothing
    assert got[4]["content_checksum"] is None
    for i in (0, 1, 2, 3):
        assert got[i]["width"] == w and got[i]["height"] == h
