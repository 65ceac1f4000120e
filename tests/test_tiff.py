"""Round-12 baseline TIFF kernel: round trips both byte orders, the
house luma parity with PNG, photometric inversion, the unsupported-
compression probe, and the dispatch through decode_image."""

import random
import struct

import pytest

from datalakehouse_spark.functions.tiff import (
    TiffError,
    TiffUnsupported,
    decode_tiff,
    encode_tiff,
    tiff_luma_stats,
)


def test_tiff_roundtrip_gray_and_rgb_both_endians():
    rng = random.Random(7)
    for w, h in ((1, 1), (5, 3), (16, 4), (33, 7)):
        gray = bytes(rng.randrange(256) for _ in range(w * h))
        for be in (False, True):
            assert decode_tiff(encode_tiff(w, h, gray, big_endian=be)) == (w, h, gray)
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        expect = bytes(
            (rgb[3 * i] * 19595 + rgb[3 * i + 1] * 38470 + rgb[3 * i + 2] * 7471 + 0x8000)
            >> 16
            for i in range(w * h)
        )
        for be in (False, True):
            assert decode_tiff(encode_tiff(w, h, rgb, color=True, big_endian=be)) == (
                w, h, expect,
            )


def test_tiff_luma_parity_with_png():
    """Pixel-identical PNG and TIFF must report the SAME mean luma —
    the cross-kernel consistency the dedup fingerprints rely on."""
    from datalakehouse_spark.functions.png import encode_png, png_luma_stats

    gray = bytes(range(64))
    assert tiff_luma_stats(encode_tiff(16, 4, gray)) == png_luma_stats(
        encode_png(16, 4, gray, color_type=0)
    )


def test_tiff_white_is_zero_inverts():
    p = bytearray(encode_tiff(2, 2, bytes([0, 64, 128, 255])))
    idx = p.find(struct.pack("<HH", 262, 3))
    p[idx + 8 : idx + 10] = struct.pack("<H", 0)
    assert decode_tiff(bytes(p))[2] == bytes([255, 191, 127, 0])


def test_tiff_compressed_probes_out_malformed_is_loud():
    p = bytearray(encode_tiff(2, 2, bytes(4)))
    idx = p.find(struct.pack("<HH", 259, 3))
    p[idx + 8 : idx + 10] = struct.pack("<H", 5)  # LZW
    with pytest.raises(TiffUnsupported):
        decode_tiff(bytes(p))
    for bad in (
        b"",
        b"II*\x00",
        b"II*\x00\x08\x00\x00\x00",
        b"junkjunk",
        encode_tiff(4, 4, bytes(16))[:-10],
    ):
        with pytest.raises(TiffError):
            decode_tiff(bad)


def test_tiff_multi_strip():
    """RowsPerStrip layouts concatenate strips in order."""
    gray = bytes(range(32))  # 8x4
    single = bytearray(encode_tiff(8, 4, gray))
    # rewrite to 2 strips of 2 rows: move offsets/counts out of line
    bo = "<"
    base = len(single)
    strip0_at = single.find(gray)
    offs = struct.pack(bo + "II", strip0_at, strip0_at + 16)
    cnts = struct.pack(bo + "II", 16, 16)
    idx = single.find(struct.pack(bo + "HH", 273, 4))
    single[idx : idx + 12] = struct.pack(bo + "HHII", 273, 4, 2, base)
    idx = single.find(struct.pack(bo + "HH", 279, 4))
    single[idx : idx + 12] = struct.pack(bo + "HHII", 279, 4, 2, base + 8)
    payload = bytes(single) + offs + cnts
    assert decode_tiff(payload) == (8, 4, gray)


def test_tiff_dispatches_through_decode_image():
    from datalakehouse_spark.operators.multimodal import decode_image, pil_available

    if pil_available():
        pytest.skip("Pillow present: it takes the dispatch instead")
    gray = bytes([0, 255, 255, 0])
    w, h, luma = decode_image(encode_tiff(2, 2, gray))
    assert (w, h) == (2, 2) and luma == pytest.approx(0.5)


def test_tiff_golden_against_pillow_when_present():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = random.Random(3)
    rgb = bytes(rng.randrange(256) for _ in range(8 * 4 * 3))
    img = PIL.frombytes("RGB", (8, 4), rgb)
    buf = io.BytesIO()
    img.save(buf, format="TIFF")
    w, h, luma = decode_tiff(buf.getvalue())
    assert (w, h) == (8, 4)
    assert luma == img.convert("L").tobytes()
