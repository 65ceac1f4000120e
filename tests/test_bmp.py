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
    rle[30] = 1  # BI_RLE8
    with pytest.raises(BmpError, match="compressed"):
        decode_bmp(bytes(rle))
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
