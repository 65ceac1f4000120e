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
    # round 13: LZW/deflate/PackBits are now DECODED; the probe-out
    # set narrows to genuine codec-library territory (JPEG-in-TIFF,
    # CCITT fax) and the floating-point predictor
    for comp in (2, 3, 4, 6, 7):
        p = bytearray(encode_tiff(2, 2, bytes(4)))
        idx = p.find(struct.pack("<HH", 259, 3))
        p[idx + 8 : idx + 10] = struct.pack("<H", comp)
        with pytest.raises(TiffUnsupported):
            decode_tiff(bytes(p))
    p = bytearray(encode_tiff(2, 2, bytes(4), predictor=True))
    idx = p.find(struct.pack("<HH", 317, 3))
    p[idx + 8 : idx + 10] = struct.pack("<H", 3)  # float predictor
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


def test_tiff_compressed_roundtrip_matrix():
    """Round 13 (VERDICT r12 #2): LZW (MSB-first EarlyChange dialect,
    dictionary growth + table reset), deflate, and PackBits all
    round-trip, with and without the horizontal-differencing
    predictor, both byte orders, gray and RGB."""
    rng = random.Random(13)
    for w, h in ((1, 1), (7, 5), (16, 4), (48, 32)):
        gray = bytes(rng.randrange(256) for _ in range(w * h))
        smooth = bytes((i * 3 + (i // w) * 7) % 256 for i in range(w * h))
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        lum = bytes(
            (rgb[3 * i] * 19595 + rgb[3 * i + 1] * 38470 + rgb[3 * i + 2] * 7471 + 0x8000)
            >> 16
            for i in range(w * h)
        )
        for comp in ("lzw", "deflate", "packbits"):
            for pred in (False, True):
                for be in (False, True):
                    enc = encode_tiff(
                        w, h, gray, big_endian=be, compression=comp, predictor=pred
                    )
                    assert decode_tiff(enc) == (w, h, gray)
                    enc = encode_tiff(
                        w, h, smooth, big_endian=be, compression=comp, predictor=pred
                    )
                    assert decode_tiff(enc) == (w, h, smooth)
                assert decode_tiff(
                    encode_tiff(w, h, rgb, color=True, compression=comp, predictor=pred)
                ) == (w, h, lum)


def test_tiff_lzw_spec_example_code_sequence():
    """The TIFF 6.0 worked example: input 7 7 7 8 8 7 7 6 6 must emit
    <Clear> 7 258 8 8 258 6 6 <EOI> — pins the dialect (MSB-first,
    symbols from 0, Clear=256/EOI=257), not just self-consistency."""
    from datalakehouse_spark.functions.tiff import _lzw_encode

    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    stream = _lzw_encode(data)
    codes, acc, nbits = [], 0, 0
    for byte in stream:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= 9:
            codes.append((acc >> (nbits - 9)) & 0x1FF)
            nbits -= 9
    assert codes == [256, 7, 258, 8, 8, 258, 6, 6, 257]


def test_tiff_lzw_width_growth_and_reset_deep():
    """Dictionary growth through 10/11/12-bit codes and the 4094-entry
    table reset both survive a long low-entropy stream."""
    from datalakehouse_spark.functions.tiff import _lzw_decode, _lzw_encode

    rng = random.Random(99)
    data = bytes(rng.randrange(3) for _ in range(120_000))
    enc = _lzw_encode(data)
    assert len(enc) < len(data)  # actually compresses
    assert _lzw_decode(enc, len(data)) == data


def test_tiff_gray_alpha_uses_sample_zero():
    """ADVICE r12: a 2-sample gray+alpha TIFF must report sample 0 as
    the luma (not fall into the RGB branch)."""
    gray = bytes([10, 200, 30, 250])
    alpha = bytes([255, 128, 0, 64])
    interleaved = bytes(v for pair in zip(gray, alpha) for v in pair)
    p = bytearray(encode_tiff(2, 2, gray))
    # rewrite SamplesPerPixel 1 -> 2, StripByteCounts 4 -> 8, and the
    # strip itself to the interleaved (gray, alpha) samples
    idx = p.find(struct.pack("<HH", 277, 3))
    p[idx + 8 : idx + 10] = struct.pack("<H", 2)
    idx = p.find(struct.pack("<HH", 279, 4))
    p[idx + 8 : idx + 12] = struct.pack("<I", 8)
    strip_at = p.find(gray)
    payload = bytes(p[:strip_at]) + interleaved
    assert decode_tiff(payload) == (2, 2, gray)


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
    # round 13: the compressed dialects against libtiff's writer
    for comp in ("tiff_lzw", "tiff_deflate", "packbits"):
        buf = io.BytesIO()
        try:
            img.save(buf, format="TIFF", compression=comp)
        except Exception:
            continue  # Pillow built without that libtiff codec
        assert decode_tiff(buf.getvalue()) == (8, 4, img.convert("L").tobytes())


# -- round 13: tiled layout (tags 322-325) ---------------------------------


def test_tiled_layout_roundtrips():
    """Tiled TIFFs (full edge-padded tiles, independent compression,
    predictor at tile width) decode identical to the strip layout for
    every compression, byte order, and non-multiple-of-16 edges."""
    import random

    from datalakehouse_spark.functions.tiff import decode_tiff, encode_tiff

    rng = random.Random(322)
    for w, h, color in ((16, 16, False), (17, 5, False), (40, 33, True), (1, 1, False)):
        spp = 3 if color else 1
        px = bytes(rng.randrange(256) for _ in range(w * h * spp))
        ref = decode_tiff(encode_tiff(w, h, px, color=color))
        for comp in ("none", "lzw", "deflate", "packbits"):
            for pred in (False, True):
                for be in (False, True):
                    for ts in (16, 32):
                        got = decode_tiff(
                            encode_tiff(
                                w, h, px, color=color, compression=comp,
                                predictor=pred, big_endian=be, tile_size=ts,
                            )
                        )
                        assert got == ref, (w, h, color, comp, pred, be, ts)


def test_tiled_layout_rejections():
    """Bad tile grids are loud: non-multiple-of-16 sizes, wrong tile
    counts, out-of-range offsets."""
    import struct

    import pytest as _pytest

    from datalakehouse_spark.functions.tiff import (
        TiffError,
        decode_tiff,
        encode_tiff,
    )

    with _pytest.raises(TiffError, match="multiple of 16"):
        encode_tiff(16, 16, bytes(256), tile_size=10)

    payload = bytearray(encode_tiff(40, 33, bytes(40 * 33), tile_size=16))
    # shrink the declared TileWidth to 16 -> decoder recomputes a grid
    # that disagrees with the stored tile count? widen instead: set
    # TileWidth tag (322) value to 48 so across shrinks 3 -> 1
    bo = "<"
    (n,) = struct.unpack(bo + "H", payload[8:10])
    pos = 10
    for _ in range(n):
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[pos : pos + 8])
        if tag == 322:
            struct.pack_into(bo + "I", payload, pos + 8, 48)
        pos += 12
    with _pytest.raises(TiffError, match="tiles"):
        decode_tiff(bytes(payload))


# -- round 13: 16-bit samples -----------------------------------------------


def test_16bit_samples_reduce_to_high_byte():
    """16-bit gray/RGB (both byte orders, strip and tiled, every
    compression, with AND without the predictor — round 14 closed the
    16-bit+predictor sliver) decode to the high byte of each sample —
    the PNG 16-bit convention."""
    import random

    import pytest as _pytest

    from datalakehouse_spark.functions.tiff import (
        TiffUnsupported,
        decode_tiff,
        encode_tiff,
    )

    rng = random.Random(65535)
    for w, h, color in ((16, 4, False), (17, 5, True)):
        spp = 3 if color else 1
        px16 = [rng.randrange(65536) for _ in range(w * h * spp)]
        ref = decode_tiff(
            encode_tiff(w, h, bytes(v >> 8 for v in px16), color=color)
        )
        for be in (False, True):
            for comp in ("none", "lzw", "deflate", "packbits"):
                for ts in (None, 16):
                    for pred in (False, True):
                        got = decode_tiff(
                            encode_tiff(
                                w, h, px16, color=color, big_endian=be,
                                compression=comp, tile_size=ts, bits=16,
                                predictor=pred,
                            )
                        )
                        assert got == ref, (w, h, color, be, comp, ts, pred)

    # predictor at 16-bit differs mod 65536 PER SAMPLE, not per byte:
    # a stream whose per-byte interpretation would differ must still
    # round-trip (values straddling the byte carry, e.g. 0x00FF->0x0100)
    carry = [0x00FF, 0x0100, 0x7FFF, 0x8000, 0xFFFF, 0x0000, 0x0001, 0xFFFE]
    got = decode_tiff(encode_tiff(4, 2, carry, predictor=True, bits=16))
    assert got == decode_tiff(
        encode_tiff(4, 2, bytes(v >> 8 for v in carry))
    )
    import struct as _struct

    payload = bytearray(encode_tiff(4, 4, [257] * 16, bits=16))
    (n,) = _struct.unpack("<H", payload[8:10])
    # append a predictor=2 tag by patching an existing tag is fiddly;
    # instead assert the mixed-depth rejection: patch BitsPerSample to 12
    pos = 10
    for _ in range(n):
        tag = _struct.unpack("<H", payload[pos : pos + 2])[0]
        if tag == 258:
            _struct.pack_into("<H", payload, pos + 8, 12)
        pos += 12
    with _pytest.raises(TiffUnsupported, match="bits per sample"):
        decode_tiff(bytes(payload))
