"""Netpbm P1..P6 and Truevision TGA (round 13): round trips against
independent expectations, dispatch, and loud rejections."""

import pytest


def test_pnm_all_six_magics():
    import random

    from datalakehouse_spark.functions.png import decode_png, encode_png
    from datalakehouse_spark.functions.pnm import (
        PnmError,
        decode_pnm,
        encode_pnm,
    )

    rng = random.Random(6)
    W, H = 7, 5
    gray = [rng.randrange(256) for _ in range(W * H)]
    rgb = [rng.randrange(256) for _ in range(W * H * 3)]
    bits = [rng.randrange(2) for _ in range(W * H)]

    # ASCII == binary for each family
    assert decode_pnm(encode_pnm(W, H, gray, 2)) == decode_pnm(
        encode_pnm(W, H, gray, 5)
    ) == (W, H, bytes(gray))
    # bitmap: 1 = BLACK
    exp_bits = bytes(0 if v else 255 for v in bits)
    assert decode_pnm(encode_pnm(W, H, bits, 1)) == decode_pnm(
        encode_pnm(W, H, bits, 4)
    ) == (W, H, exp_bits)
    # color luma identical to the PNG kernel on the same pixels
    exp_rgb = decode_png(encode_png(W, H, bytes(rgb), color_type=2))
    assert decode_pnm(encode_pnm(W, H, rgb, 3)) == decode_pnm(
        encode_pnm(W, H, rgb, 6)
    ) == exp_rgb
    # 16-bit: big-endian, high-byte reduction
    assert decode_pnm(
        encode_pnm(W, H, [v * 257 for v in gray], 5, maxval=65535)
    ) == (W, H, bytes(gray))
    # non-255 maxval scales by round(v*255/maxval)
    g15 = [rng.randrange(16) for _ in range(W * H)]
    exp15 = bytes((v * 255 + 7) // 15 for v in g15)
    assert decode_pnm(encode_pnm(W, H, g15, 5, maxval=15)) == (W, H, exp15)
    # comments in headers
    p = encode_pnm(3, 1, [1, 2, 3], 2).replace(b"P2\n", b"P2\n# c\n")
    assert decode_pnm(p) == (3, 1, bytes([1, 2, 3]))
    # loud: truncated data, sample above maxval
    with pytest.raises(PnmError, match="shorter"):
        decode_pnm(encode_pnm(W, H, gray, 5)[:-3])
    bad = bytearray(encode_pnm(2, 1, [1, 2], 5, maxval=100))
    bad[-1] = 200
    with pytest.raises(PnmError, match="above maxval"):
        decode_pnm(bytes(bad))


def test_tga_profiles_and_sniff():
    import random

    from datalakehouse_spark.functions.bmp import decode_bmp, encode_bmp16
    from datalakehouse_spark.functions.png import decode_png, encode_png
    from datalakehouse_spark.functions.tga import (
        TgaError,
        decode_tga,
        encode_tga,
        looks_like_tga,
    )

    rng = random.Random(3)
    W, H = 9, 6
    gray = bytes(rng.randrange(256) for _ in range(W * H))
    rgb = bytes(rng.randrange(256) for _ in range(W * H * 3))

    for rle in (False, True):
        for td in (True, False):
            p = encode_tga(W, H, gray, "gray", rle=rle, top_down=td)
            assert looks_like_tga(p)
            assert decode_tga(p) == (W, H, gray)
    # truecolor == PNG luma of the same pixels
    exp = decode_png(encode_png(W, H, rgb, color_type=2))
    assert decode_tga(encode_tga(W, H, rgb, "bgr")) == exp
    assert decode_tga(encode_tga(W, H, rgb, "bgr", rle=True)) == exp
    # ARGB1555 == the BMP 555 identity
    exp16 = decode_bmp(encode_bmp16(W, H, rgb, 555))
    assert decode_tga(encode_tga(W, H, rgb, "argb1555", rle=True)) == exp16
    # color-mapped
    pal = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(256)
    ]
    idx = bytes(rng.randrange(256) for _ in range(W * H))
    rgbm = bytes(v for i in idx for v in pal[i])
    expm = decode_png(encode_png(W, H, rgbm, color_type=2))
    assert decode_tga(encode_tga(W, H, idx, "mapped", palette=pal)) == expm
    # loud rejections
    with pytest.raises(TgaError, match="short"):
        decode_tga(b"\x00" * 17)
    with pytest.raises(TgaError, match="TGA RLE"):
        decode_tga(encode_tga(W, H, gray, "gray", rle=True)[:30])


def test_pnm_tga_dispatch():
    """Magic dispatch: PNM by header, TGA by the LAST-resort sniff;
    the same gray pixels mean the same through every kernel."""
    from datalakehouse_spark.functions.pnm import encode_pnm
    from datalakehouse_spark.functions.tga import encode_tga
    from datalakehouse_spark.operators.multimodal import decode_image

    gray = bytes((i * 37) % 256 for i in range(32))
    a = decode_image(encode_pnm(8, 4, list(gray), 5))
    b = decode_image(encode_tga(8, 4, gray, "gray", rle=True))
    c = decode_image(encode_pnm(8, 4, list(gray), 2))
    assert a == b == c and a[:2] == (8, 4)
