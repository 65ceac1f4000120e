"""QOI and ZSoft PCX (round 13): real compressed round trips against
independent expectations, op coverage, dispatch, loud rejections."""

import pytest


def test_qoi_all_ops_roundtrip():
    import random

    from datalakehouse_spark.functions.png import decode_png, encode_png
    from datalakehouse_spark.functions.qoi import (
        QoiError,
        decode_qoi,
        encode_qoi,
    )

    rng = random.Random(9)
    cases = [
        # random pixels: RGB literals + INDEX hits
        (9, 7, bytes(rng.randrange(256) for _ in range(9 * 7 * 3))),
        # smooth gradient: DIFF/LUMA ops
        (16, 4, bytes((i // 3) % 256 for i in range(16 * 4 * 3))),
        # constant: one long RUN chain
        (8, 8, bytes([77]) * (8 * 8 * 3)),
        (1, 1, bytes([13, 14, 15])),
    ]
    for W, H, rgb in cases:
        exp = decode_png(encode_png(W, H, rgb, color_type=2))
        assert decode_qoi(encode_qoi(W, H, rgb)) == exp
    # repeated tiles hammer INDEX
    tile = bytes(rng.randrange(256) for _ in range(12))
    rgb = (tile * 100)[: 10 * 10 * 3]
    assert decode_qoi(encode_qoi(10, 10, rgb)) == decode_png(
        encode_png(10, 10, rgb, color_type=2)
    )
    # the stream is genuinely compressed on redundant input
    assert len(encode_qoi(8, 8, bytes([77]) * 192)) < 192 // 4
    with pytest.raises(QoiError, match="magic"):
        decode_qoi(b"qoix" + b"\x00" * 30)
    with pytest.raises(QoiError, match="exhausted|end marker"):
        decode_qoi(encode_qoi(9, 7, cases[0][2])[:-12])


def test_pcx_three_profiles():
    import random

    from datalakehouse_spark.functions.pcx import (
        PcxError,
        decode_pcx,
        encode_pcx,
    )
    from datalakehouse_spark.functions.png import decode_png, encode_png

    rng = random.Random(11)
    for W, H in ((7, 5), (16, 4), (33, 9)):
        gray = bytes(rng.randrange(256) for _ in range(W * H))
        assert decode_pcx(encode_pcx(W, H, gray, "gray")) == (W, H, gray)
        rgb = bytes(rng.randrange(256) for _ in range(W * H * 3))
        exp = decode_png(encode_png(W, H, rgb, color_type=2))
        assert decode_pcx(encode_pcx(W, H, rgb, "rgb")) == exp
        bits = [rng.randrange(2) for _ in range(W * H)]
        assert decode_pcx(encode_pcx(W, H, bits, "mono")) == (
            W, H, bytes(255 if v else 0 for v in bits),
        )
    # non-identity VGA palette routes through the trailing table
    pal = [(rng.randrange(256),) * 3 for _ in range(256)]
    idx = bytes(rng.randrange(256) for _ in range(20))
    assert decode_pcx(encode_pcx(5, 4, idx, "gray", palette=pal)) == (
        5, 4, bytes(pal[v][0] for v in idx),
    )
    with pytest.raises(PcxError, match="magic"):
        decode_pcx(b"\x0b" + b"\x00" * 200)
    with pytest.raises(PcxError, match="RLE"):
        decode_pcx(encode_pcx(16, 16, bytes(256), "gray")[:140])


def test_qoi_pcx_dispatch():
    from datalakehouse_spark.functions.pcx import encode_pcx
    from datalakehouse_spark.functions.qoi import encode_qoi
    from datalakehouse_spark.operators.multimodal import decode_image

    gray = bytes((i * 41) % 256 for i in range(32))
    rgb = bytes(v for b in gray for v in (b, b, b))
    a = decode_image(encode_qoi(8, 4, rgb))
    b = decode_image(encode_pcx(8, 4, gray, "gray"))
    assert a == b and a[:2] == (8, 4)


def test_pcx_run_crossing_scanline_boundary():
    """A run that overflows past one scanline carries into the next
    (count-wise fill across the whole image, ADVICE r13)."""
    import struct

    from datalakehouse_spark.functions.pcx import decode_pcx

    # 4x2 gray, bpl=4: hand-built stream whose single run of 6 spans
    # row 0 entirely and bleeds 2 bytes into row 1.
    header = bytearray(128)
    header[0] = 0x0A
    header[1] = 5
    header[2] = 1
    header[3] = 8
    struct.pack_into("<4H", header, 4, 0, 0, 3, 1)
    header[65] = 1
    struct.pack_into("<H", header, 66, 4)
    body = bytes([0xC6, 0x55, 0x10, 0x20])  # run 6 x 0x55, then 2 literals
    w, h, luma = decode_pcx(bytes(header) + body)
    assert (w, h) == (4, 2)
    assert luma == bytes([0x55] * 6 + [0x10, 0x20])


def test_qoi_truncated_mid_pixel_raises():
    """Ops must stop exactly at the end marker: a stream truncated
    mid-pixel must raise, not silently consume marker bytes as INDEX
    ops (ADVICE r13)."""
    import pytest

    from datalakehouse_spark.functions.qoi import (
        QoiError,
        decode_qoi,
        encode_qoi,
    )

    gray = bytes((i * 37) % 256 for i in range(48))
    rgb = bytes(v for b in gray for v in (b, b, b))
    full = encode_qoi(4, 4, rgb[: 4 * 4 * 3])
    # chop ops from the tail but keep a VALID end marker: the remaining
    # ops under-fill the pixel count, then eat marker zeros as INDEX 0
    # unless the pos==end check fires.
    for cut in range(1, 6):
        body = full[14:-8]
        if len(body) <= cut:
            break
        truncated = full[:14] + body[:-cut] + full[-8:]
        with pytest.raises(QoiError):
            decode_qoi(truncated)


def test_tga_sniff_rejects_zero_width():
    """Lexicographic (w,h) > (0,0) let width=0,height>0 pass; the sniff
    must require both positive (ADVICE r13)."""
    import struct

    from datalakehouse_spark.functions.tga import encode_tga, looks_like_tga

    good = encode_tga(4, 4, bytes(16), "gray")
    assert looks_like_tga(good)
    zero_w = bytearray(good)
    struct.pack_into("<H", zero_w, 12, 0)
    assert not looks_like_tga(bytes(zero_w[:18]))
    zero_h = bytearray(good)
    struct.pack_into("<H", zero_h, 14, 0)
    assert not looks_like_tga(bytes(zero_h[:18]))
