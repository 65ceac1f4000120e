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
