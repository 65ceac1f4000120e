"""ICO/CUR (round 13): the favicon container — directory parsing,
PNG-in-ICO and DIB-in-ICO through the shared kernels, largest-image
selection, and loud rejections."""

import struct

import pytest


def test_ico_png_and_dib_roundtrips():
    import random

    from datalakehouse_spark.functions.bmp import (
        decode_bmp,
        encode_bmp,
        encode_bmp16,
        encode_bmp_palette,
        encode_bmp_rle,
    )
    from datalakehouse_spark.functions.ico import decode_ico, encode_ico
    from datalakehouse_spark.functions.png import decode_png, encode_png

    rng = random.Random(7)
    grays = [(i, i, i) for i in range(256)]

    # every BMP profile the kernel knows works inside an ICO
    rgb = bytes(rng.randrange(256) for _ in range(8 * 8 * 3))
    idx = bytes(rng.randrange(256) for _ in range(8 * 8))
    for bmp in (
        encode_bmp(8, 8, rgb),
        encode_bmp16(8, 8, rgb, 555),
        encode_bmp16(8, 8, rgb, 565),
        encode_bmp_palette(8, 8, idx, grays),
        encode_bmp_rle(8, 8, idx, grays, bpp=8),
    ):
        ico = encode_ico([(8, 8, bmp, "bmp")])
        assert decode_ico(ico) == decode_bmp(bmp)

    # PNG payloads pass through the PNG kernel
    gray = bytes(rng.randrange(256) for _ in range(16 * 4))
    png = encode_png(16, 4, gray, color_type=0)
    assert decode_ico(encode_ico([(16, 4, png, "png")])) == decode_png(png)

    # largest image wins (the thumbnailer choice), CUR works too
    small = encode_png(2, 2, bytes(4), color_type=0)
    mixed = encode_ico([(2, 2, small, "png"), (8, 8, bmp, "bmp")])
    assert decode_ico(mixed) == decode_bmp(bmp)
    assert decode_ico(
        encode_ico([(8, 8, bmp, "bmp")], cur=True)
    ) == decode_bmp(bmp)


def test_ico_dispatch_and_rejections():
    from datalakehouse_spark.functions.bmp import encode_bmp
    from datalakehouse_spark.functions.ico import (
        IcoError,
        decode_ico,
        encode_ico,
    )
    from datalakehouse_spark.operators.multimodal import decode_image

    rgb = bytes(v for b in range(32, 96) for v in (b, b, b))
    ico = encode_ico([(8, 8, encode_bmp(8, 8, rgb), "bmp")])
    w, h, mean = decode_image(ico)
    assert (w, h) == (8, 8)
    assert abs(mean - sum(range(32, 96)) / (255.0 * 64)) < 1e-12

    with pytest.raises(IcoError, match="bad ICONDIR"):
        decode_ico(b"\x01\x00\x01\x00\x01\x00" + b"\x00" * 16)
    with pytest.raises(IcoError, match="empty"):
        decode_ico(struct.pack("<HHH", 0, 1, 0))
    # payload range check
    bad = bytearray(ico)
    struct.pack_into("<I", bad, 6 + 8, 1 << 30)  # size field
    with pytest.raises(IcoError, match="out of range"):
        decode_ico(bytes(bad))
    # odd DIB height (no AND plane) is loud
    dib_h = bytearray(ico)
    # the DIB starts right after the 6+16 directory; height at +8
    struct.pack_into("<i", dib_h, 6 + 16 + 8, 15)
    with pytest.raises(IcoError, match="doubled"):
        decode_ico(bytes(dib_h))
