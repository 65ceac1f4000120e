"""BMP decoder (functions/bmp.py, round 11).

Coverage: 24-bit round trips (exact luma, bottom-up storage, row
padding at non-multiple-of-4 widths), top-down negative height, 8-bit
palettized, V4/V5 32-bit BITFIELDS with standard masks (the real
python.bmp shipped in CPython's test data), malformed rejection, and
the decode_image dispatch."""

import glob
import random
import struct

import pytest

from datalakehouse_spark.functions.bmp import (
    BmpError,
    bmp_luma_stats,
    decode_bmp,
    encode_bmp,
)


def _luma(r, g, b):
    return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16


def test_roundtrip_exact_24bit_padded_width():
    rng = random.Random(9)
    w, h = 7, 5  # stride pads 21 -> 24 bytes
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    gw, gh, luma = decode_bmp(encode_bmp(w, h, rgb))
    assert (gw, gh) == (w, h)
    assert luma == bytes(
        _luma(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]) for i in range(w * h)
    )


def test_top_down_negative_height():
    rgb = bytes([255, 0, 0] * 4 + [0, 0, 255] * 4)  # red row, blue row
    d = bytearray(encode_bmp(4, 2, rgb))
    # flip to top-down: negate height, reverse the (stride-aligned) rows
    d[22:26] = struct.pack("<i", -2)
    stride = 12
    d[54 : 54 + 2 * stride] = (
        d[54 + stride : 54 + 2 * stride] + d[54 : 54 + stride]
    )
    _, _, luma = decode_bmp(bytes(d))
    assert luma == bytes([_luma(255, 0, 0)] * 4 + [_luma(0, 0, 255)] * 4)


def test_8bit_palettized():
    # hand-build: 40-byte header, 2-color table, 4x2 indices
    w, h = 4, 2
    pal = b"\x00\x00\x00\x00" + b"\xff\xff\xff\x00"  # BGRX: black, white
    rows = bytes([0, 1, 0, 1]) + bytes([1, 1, 0, 0])  # bottom-up rows
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, 8, 0, 0, 2, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + 8 + 8, 0, 0, 14 + 40 + 8)
    _, _, luma = decode_bmp(head + info + pal + rows)
    # top row of the image is the LAST stored row (bottom-up)
    assert luma == bytes([255, 255, 0, 0, 0, 255, 0, 255])


def test_real_python_bmp_v5_bitfields():
    paths = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/**/python.bmp",
        recursive=True,
    )
    if not paths:
        pytest.skip("CPython test BMPs absent")
    for p in paths:
        with open(p, "rb") as fh:
            w, h, mean = bmp_luma_stats(fh.read())
        assert (w, h) == (16, 16), p
        assert abs(mean - 0.379075) < 0.001, (p, mean)


def test_malformed_rejection():
    good = encode_bmp(2, 2, bytes(12))
    with pytest.raises(BmpError):
        decode_bmp(b"")
    with pytest.raises(BmpError):
        decode_bmp(b"PM" + good[2:])
    with pytest.raises(BmpError):
        decode_bmp(good[:-5])  # pixel data short
    rle = bytearray(good)
    rle[30] = 1  # BI_RLE8 on a 24-bit image: bpp mismatch (round 12:
    # RLE8 itself decodes now, but only with bpp 8)
    with pytest.raises(BmpError, match="RLE8 needs matching bpp"):
        decode_bmp(bytes(rle))
    jpeg_in_bmp = bytearray(good)
    jpeg_in_bmp[30] = 4  # BI_JPEG stays a loud probe
    with pytest.raises(BmpError, match="compressed"):
        decode_bmp(bytes(jpeg_in_bmp))
    with pytest.raises(BmpError):
        encode_bmp(2, 2, bytes(11))


def test_decode_image_dispatches_bmp():
    from datalakehouse_spark.operators.multimodal import (
        decode_image,
        pil_available,
    )

    if pil_available():
        pytest.skip("Pillow present: dispatch not reachable")
    payload = encode_bmp(2, 1, bytes([255, 255, 255, 0, 0, 0]))
    w, h, mean = decode_image(payload)
    assert (w, h) == (2, 1) and mean == 0.5
    with pytest.raises(BmpError):
        decode_image(payload[:-2])


# -- round 12: RLE + sub-byte palettized profiles ------------------------------


def _lum(idx_list, pal):
    return bytes(
        (pal[i][0] * 19595 + pal[i][1] * 38470 + pal[i][2] * 7471 + 0x8000) >> 16
        for i in idx_list
    )


def test_palettized_subbyte_and_rle_roundtrips():
    """1/4/8-bit uncompressed palettes and BI_RLE8/BI_RLE4 (runs,
    absolute mode with word padding, EOL/EOB) all decode back to the
    palette luma of the written indices."""
    import random

    from datalakehouse_spark.functions.bmp import (
        decode_bmp,
        encode_bmp_palette,
        encode_bmp_rle,
    )

    rng = random.Random(9)
    grays = [(i * 17, i * 17, i * 17) for i in range(16)]
    pal256 = [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)]
    bw = [(0, 0, 0), (255, 255, 255)]
    for w, h in ((1, 1), (5, 3), (8, 4), (13, 7)):
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        expect = _lum(idx, pal256)
        assert decode_bmp(encode_bmp_palette(w, h, idx, pal256, bpp=8)) == (w, h, expect)
        assert decode_bmp(encode_bmp_rle(w, h, idx, pal256, bpp=8)) == (w, h, expect)
        if w >= 3:
            assert decode_bmp(
                encode_bmp_rle(w, h, idx, pal256, bpp=8, absolute_prefix=3)
            ) == (w, h, expect)
        idx4 = bytes(rng.randrange(16) for _ in range(w * h))
        e4 = _lum(idx4, grays)
        assert decode_bmp(encode_bmp_palette(w, h, idx4, grays, bpp=4)) == (w, h, e4)
        assert decode_bmp(encode_bmp_rle(w, h, idx4, grays, bpp=4)) == (w, h, e4)
        if w >= 4:
            assert decode_bmp(
                encode_bmp_rle(w, h, idx4, grays, bpp=4, absolute_prefix=4)
            ) == (w, h, e4)
        idx1 = bytes(rng.randrange(2) for _ in range(w * h))
        assert decode_bmp(encode_bmp_palette(w, h, idx1, bw, bpp=1)) == (
            w, h, _lum(idx1, bw),
        )


def test_rle_delta_skip_and_malformed():
    """Delta skips leave index 0 behind; a stream without end-of-bitmap
    and a top-down RLE header are loud."""
    import struct

    import pytest as _pytest

    from datalakehouse_spark.functions.bmp import (
        BmpError,
        _bmp_wrap,
        decode_bmp,
        encode_bmp_rle,
    )

    pal = [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)]
    body = bytes([2, 5]) + b"\x00\x02" + bytes([1, 1]) + bytes([1, 7]) + b"\x00\x01"
    w, h, luma = decode_bmp(_bmp_wrap(4, 2, 8, 1, pal, body))
    grid = [[0] * 4 for _ in range(2)]
    grid[1][0] = grid[1][1] = 5  # RLE starts at the BOTTOM row
    grid[0][3] = 7  # delta (1,1) then a 1-run
    assert luma == _lum([v for row in grid for v in row], pal)

    with _pytest.raises(BmpError, match="end-of-bitmap"):
        decode_bmp(_bmp_wrap(4, 2, 8, 1, pal, bytes([2, 5])))
    bad = bytearray(encode_bmp_rle(4, 2, bytes(8), pal, bpp=8))
    struct.pack_into("<i", bad, 22, -2)
    with _pytest.raises(BmpError, match="top-down RLE"):
        decode_bmp(bytes(bad))


# -- round 13: 16-bit RGB555/RGB565 profiles ------------------------------


def test_bmp16_roundtrips_and_equivalences():
    """RGB555 (BI_RGB and BITFIELDS spellings) and RGB565 decode with
    Pillow-identical bit replication; a 555 image equals the 24-bit
    encoding of its quantized pixels; quantize_rgb555 is idempotent."""
    import random

    from datalakehouse_spark.functions.bmp import (
        decode_bmp,
        encode_bmp,
        encode_bmp16,
        quantize_rgb555,
    )

    rng = random.Random(13)
    for w, h in ((1, 1), (3, 2), (7, 5), (16, 4)):
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        q = quantize_rgb555(rgb)
        assert quantize_rgb555(q) == q
        d555 = decode_bmp(encode_bmp16(w, h, rgb, 555))
        assert d555 == decode_bmp(encode_bmp16(w, h, rgb, 555, bitfields=True))
        assert d555 == decode_bmp(encode_bmp(w, h, q))
        w5, h5, _ = decode_bmp(encode_bmp16(w, h, rgb, 565))
        assert (w5, h5) == (w, h)


def test_bmp16_gray_byte_math():
    """Gray pixels: 555 luma IS the 5-bit expansion; 565 luma folds the
    ITU-R 601-2 constants to e5*27066 + e6*38470 — the exact integer
    formulas the DuckDB oracle recomputes."""
    from datalakehouse_spark.functions.bmp import decode_bmp, encode_bmp16

    gray = bytes(range(32, 127)) + bytes(range(33))
    rgb = bytes(v for b in gray for v in (b, b, b))
    w, h = 16, 8

    def e5(b):
        v = b >> 3
        return (v << 3) | (v >> 2)

    def e6(b):
        v = b >> 2
        return (v << 2) | (v >> 4)

    assert decode_bmp(encode_bmp16(w, h, rgb, 555))[2] == bytes(
        e5(b) for b in gray
    )
    assert decode_bmp(encode_bmp16(w, h, rgb, 565))[2] == bytes(
        (e5(b) * 27066 + e6(b) * 38470 + 32768) >> 16 for b in gray
    )


def test_bmp16_rejections_and_dispatch():
    """Non-standard 16-bit masks are loud; decode_image routes 16-bit
    BMPs through the shared magic dispatch."""
    import struct

    import pytest as _pytest

    from datalakehouse_spark.functions.bmp import (
        BmpError,
        decode_bmp,
        encode_bmp16,
    )
    from datalakehouse_spark.operators.multimodal import decode_image

    payload = encode_bmp16(4, 2, bytes(4 * 2 * 3), 565)
    bad = bytearray(payload)
    struct.pack_into("<I", bad, 54, 0x0F00)  # mangle the red mask
    with _pytest.raises(BmpError, match="16-bit BITFIELDS"):
        decode_bmp(bytes(bad))

    gray = bytes((i * 17) % 256 for i in range(8))
    rgb = bytes(v for b in gray for v in (b, b, b))
    w, h, mean = decode_image(encode_bmp16(4, 2, rgb, 555))
    assert (w, h) == (4, 2)
    exp = [((b >> 3) << 3) | ((b >> 3) >> 2) for b in gray]
    assert abs(mean - sum(exp) / (255.0 * 8)) < 1e-12
