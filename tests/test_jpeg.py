"""Pure-stdlib baseline JPEG codec (functions/jpeg.py) — the
compressed-image decode kernel for Pillow-less containers (round 11).

Coverage: exact round trips for constant-block images (the DC-only
oracle-fixture property, grayscale AND color at 4:4:4/4:2:0), bounded
error for general images under all-ones quant tables, an independent
numpy IDCT cross-check of the separable pure-Python IDCT, restart
markers, 16-bit quant tables, non-multiple-of-8 dimensions, the
Huffman table builder against spec examples, and loud rejection of
progressive/arithmetic/truncated/corrupt payloads — including the
decode_image dispatch contract (JpegError for corrupt baseline,
NotImplementedError for out-of-profile)."""

import os
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datalakehouse_spark.functions.jpeg import (
    ZIGZAG,
    JpegError,
    JpegUnsupported,
    _canonical_codes,
    _idct_2d,
    decode_jpeg,
    encode_jpeg,
    jpeg_luma_stats,
)


def _block_image(values, blocks_per_row):
    """One constant 8x8 block per byte -> (width, height, pixels)."""
    n = len(values)
    assert n % blocks_per_row == 0
    rows = n // blocks_per_row
    width = blocks_per_row * 8
    pix = bytearray(width * rows * 8)
    for i, v in enumerate(values):
        brow, bcol = divmod(i, blocks_per_row)
        for x in range(8):
            off = (brow * 8 + x) * width + bcol * 8
            pix[off : off + 8] = bytes([v]) * 8
    return width, rows * 8, bytes(pix)


# ---------------------------------------------------------------------------
# exact round trips (the oracle-fixture property)
# ---------------------------------------------------------------------------


def test_gray_constant_blocks_roundtrip_exact():
    rng = random.Random(11)
    vals = bytes(rng.randrange(256) for _ in range(64))
    w, h, pix = _block_image(vals, 16)
    got_w, got_h, luma = decode_jpeg(encode_jpeg(w, h, pix))
    assert (got_w, got_h) == (w, h)
    assert luma == pix  # bit-exact: DC-only blocks under q=1


def test_gray_constant_blocks_mean_matches_byte_math():
    vals = bytes(range(64))
    w, h, pix = _block_image(vals, 8)
    gw, gh, mean = jpeg_luma_stats(encode_jpeg(w, h, pix))
    assert (gw, gh) == (w, h)
    assert mean == sum(vals) / (255.0 * len(vals))


@given(st.binary(min_size=4, max_size=16))
@settings(max_examples=20, deadline=None)
def test_gray_constant_blocks_roundtrip_exact_property(vals):
    vals = vals[: 4 * (len(vals) // 4)]
    if not vals:
        vals = b"\x00\x40\x80\xff"
    w, h, pix = _block_image(vals, 4)
    assert decode_jpeg(encode_jpeg(w, h, pix))[2] == pix


def test_color_constant_roundtrip_exact_all_subsamplings():
    # constant RGB -> constant YCbCr -> DC-only everywhere; all three
    # subsamplings must agree exactly and match the reference math
    # (422 exercises the decoder's asymmetric Hi=2,Vi=1 MCU layout)
    r, g, b = 200, 30, 90
    pix = bytes([r, g, b]) * (16 * 16)
    for sub in ("444", "422", "420"):
        w, h, luma = decode_jpeg(
            encode_jpeg(16, 16, pix, color=True, subsampling=sub)
        )
        assert (w, h) == (16, 16)
        assert len(set(luma)) == 1, f"constant image not constant under {sub}"
        # reference: encoder's float YCbCr, decoder's round-half-up
        # RGB reconstruction, then the ITU-R 601-2 integer luma
        yv = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        rr = min(255, max(0, int(round(yv) + 1.402 * round(cr) + 0.5)))
        gg = min(
            255,
            max(
                0,
                int(
                    round(yv)
                    - 0.344136 * round(cb)
                    - 0.714136 * round(cr)
                    + 0.5
                ),
            ),
        )
        bb = min(255, max(0, int(round(yv) + 1.772 * round(cb) + 0.5)))
        expect = (rr * 19595 + gg * 38470 + bb * 7471 + 0x8000) >> 16
        assert abs(luma[0] - expect) <= 1


# ---------------------------------------------------------------------------
# general images: bounded error, independent IDCT reference
# ---------------------------------------------------------------------------


def test_gray_general_roundtrip_bounded_error_odd_dims():
    rng = random.Random(23)
    w, h = 23, 17  # forces edge padding in both axes
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    gw, gh, luma = decode_jpeg(encode_jpeg(w, h, pix))
    assert (gw, gh) == (w, h)
    err = max(abs(a - b) for a, b in zip(pix, luma))
    assert err <= 2  # q=1: only DCT/quant rounding noise


def test_color_general_roundtrip_bounded_error_444():
    rng = random.Random(29)
    w, h = 24, 16
    pix = bytes(rng.randrange(256) for _ in range(3 * w * h))
    _, _, luma = decode_jpeg(encode_jpeg(w, h, pix, color=True))
    # reference luma via the direct formula; random-noise blocks
    # accumulate per-coefficient quantize rounding across 64 ACs x
    # 3 channels (chroma gains up to 1.77 recombine back into luma
    # with near-cancelling weights), so individual pixels can be off
    # by a few counts — bound the max and the mean
    errs = []
    for i in range(w * h):
        r, g, b = pix[3 * i], pix[3 * i + 1], pix[3 * i + 2]
        expect = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
        errs.append(abs(luma[i] - expect))
    assert max(errs) <= 5
    assert sum(errs) / len(errs) <= 1.0


def test_idct_matches_numpy_reference():
    """The separable pure-Python IDCT against an independent dense
    numpy implementation of the normative formula."""
    np = pytest.importorskip("numpy")
    rng = random.Random(31)
    A = np.array(
        [
            [
                (np.sqrt(0.5) if u == 0 else 1.0)
                / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    for _ in range(10):
        F = np.array(
            [[rng.randrange(-512, 512) for _ in range(8)] for _ in range(8)],
            dtype=float,
        )
        ref = A.T @ F @ A  # f(x,y) = sum_uv A[u,x] F[u,v] A[v,y]
        coef = [0.0] * 64
        for u in range(8):
            for v in range(8):
                coef[u * 8 + v] = F[u, v]
        got = _idct_2d(coef)
        for x in range(8):
            for y in range(8):
                assert abs(got[x * 8 + y] - ref[x, y]) < 1e-9


# ---------------------------------------------------------------------------
# decoder features: restart markers, 16-bit DQT, huffman builder
# ---------------------------------------------------------------------------


def test_restart_markers_decode():
    """Insert DRI + RSTn into an encoder stream re-encoded MCU-by-MCU:
    build the same image as independent per-MCU scans stitched with
    restart markers and absolute (reset) DC predictors."""
    from datalakehouse_spark.functions import jpeg as J

    vals = bytes([10, 250, 40, 200])
    w, h, pix = _block_image(vals, 4)  # 32x8: 4 MCUs of one block each
    base = encode_jpeg(w, h, pix)

    # re-encode the entropy segment with a restart after every MCU
    dc_t = J._encode_table(J._STD_DC_LUM)
    ac_t = J._encode_table(J._STD_AC_LUM)
    segments = []
    for i, v in enumerate(vals):
        bw = J._BitWriter()
        block = [float(v) - 128.0] * 64
        J._encode_block(bw, block, [1] * 64, 0, dc_t, ac_t)  # pred reset
        segments.append(bw.flush())
    scan = b""
    for i, seg in enumerate(segments):
        scan += seg
        if i < len(segments) - 1:
            scan += bytes([0xFF, 0xD0 + (i % 8)])

    sos_at = base.index(b"\xff\xda")
    (sos_len,) = struct.unpack(">H", base[sos_at + 2 : sos_at + 4])
    head = base[: sos_at + 2 + sos_len]
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)  # restart interval 1
    payload = head[:sos_at] + dri + head[sos_at:] + scan + b"\xff\xd9"
    got_w, got_h, luma = decode_jpeg(payload)
    assert (got_w, got_h) == (w, h)
    assert luma == pix


def test_16bit_quant_table_accepted():
    q = [1] * 64
    q[0] = 300  # forces Pq=1 (16-bit) DQT emission
    vals = bytes([128] * 4)  # level-shifted DC = 0: exact under any q
    w, h, pix = _block_image(vals, 4)
    got = decode_jpeg(encode_jpeg(w, h, pix, quant_luma=q))
    assert got[2] == pix


def test_canonical_huffman_builder_spec_shape():
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    table = _canonical_codes(bits, list(range(12)))
    # 12 codes, prefix-free, lengths follow BITS
    assert len(table) == 12
    lengths = sorted(length for (length, _code) in table)
    assert lengths == [2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9]
    # spec K.3.1: category 0 -> code 00 (length 2)
    assert table[(2, 0)] == 0


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))


# ---------------------------------------------------------------------------
# rejection: malformed + out-of-profile
# ---------------------------------------------------------------------------


def test_rejects_non_jpeg_and_truncations():
    with pytest.raises(JpegError):
        decode_jpeg(b"")
    with pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    good = encode_jpeg(*(_block_image(bytes([7, 8, 9, 10]), 4)))
    with pytest.raises(JpegError):
        decode_jpeg(good[:20])  # truncated in the marker stream
    with pytest.raises(JpegError):
        decode_jpeg(good[:-24])  # truncated mid-entropy
    with pytest.raises(JpegError):
        decode_jpeg(good[:2] + b"\xff\xd9")  # EOI before SOS


def test_rejects_unsupported_profiles():
    w, h, pix = _block_image(bytes([1, 2, 3, 4]), 4)
    good = bytearray(encode_jpeg(w, h, pix))
    sof = good.index(b"\xff\xc0")
    for marker, exc_match in [
        (0xC9, "arithmetic"),
        (0xC3, "SOF3"),  # lossless; SOF1 at 8-bit DECODES since round 12
    ]:
        bad = bytearray(good)
        bad[sof + 1] = marker
        with pytest.raises(JpegUnsupported, match=exc_match):
            decode_jpeg(bytes(bad))
    # flipping SOF0->SOF2 yields a PROGRESSIVE frame whose single scan
    # illegally spans 0..63 (DC and AC bands mixed): structural error,
    # not an unsupported profile
    bad = bytearray(good)
    bad[sof + 1] = 0xC2
    with pytest.raises(JpegError, match="mixing DC and AC"):
        decode_jpeg(bytes(bad))


def test_decode_image_dispatch_contract():
    """decode_image (Pillow-less container): baseline JPEG decodes
    for real, corrupt baseline raises (codec error -> (0,0,NULL)
    degradation in extract_features), arithmetic coding maps to
    NotImplementedError, unknown magic stays probe-guarded."""
    from datalakehouse_spark.operators.multimodal import (
        decode_image,
        pil_available,
    )

    if pil_available():  # the stdlib dispatch only runs Pillow-less
        pytest.skip("Pillow present: dispatch not reachable")
    vals = bytes([60] * 4)
    w, h, pix = _block_image(vals, 4)
    payload = encode_jpeg(w, h, pix)
    gw, gh, mean = decode_image(payload)
    assert (gw, gh) == (w, h)
    assert mean == 60 / 255.0
    # corrupt: entropy stream chopped -> codec error, NOT NotImplemented
    with pytest.raises(JpegError):
        decode_image(payload[:-24])
    # out-of-profile real JPEG (arithmetic coding) -> honest probe
    arith = bytearray(payload)
    arith[arith.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="profile"):
        decode_image(bytes(arith))
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFX not an image")


def test_extract_features_real_kernel_decodes_jpeg(spark):
    """The mapInPandas real-kernel path (extract_features fake=False)
    over a mixed PNG/JPEG/corrupt asset table."""
    from datalakehouse_spark.functions.png import encode_png
    from datalakehouse_spark.operators.multimodal import extract_features

    w, h, pix = _block_image(bytes([100, 200]), 2)
    jpeg_payload = encode_jpeg(w, h, pix)
    png_payload = encode_png(4, 1, bytes([100, 200, 100, 200]), color_type=0)
    rows = [
        (1, "image", jpeg_payload),
        (2, "image", png_payload),
        (3, "image", b"\xff\xd8garbage"),
    ]
    df = spark.createDataFrame(rows, "asset_id long, media_type string, payload binary")
    got = {
        r["asset_id"]: r
        for r in extract_features(df, fake=False).collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (w, h)
    assert abs(got[1]["mean_luma"] - 150 / 255.0) < 1e-12
    assert abs(got[2]["mean_luma"] - 150 / 255.0) < 1e-12
    assert got[3]["width"] == 0 and got[3]["height"] == 0


_SPARK_IMAGES = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


@pytest.mark.skipif(
    not os.path.isdir(_SPARK_IMAGES), reason="Spark mllib sample images absent"
)
def test_decodes_real_libjpeg_photos():
    """Interop against real-world libjpeg output: the baseline photos
    shipped with Spark's mllib samples (full AC content, subsampled
    chroma, optimized Huffman tables — nothing our own encoder
    produced).  Dimensions are objective facts of the files; the mean
    luma values are regression pins from this kernel (libjpeg's fast
    integer IDCT could differ by well under the 0.01 band)."""
    expected = {
        "kittens/29.5.a_b_EGDP022204.jpg": (300, 200, 0.5082),
        "kittens/54893.jpg": (300, 311, 0.6447),
        "kittens/DP153539.jpg": (300, 296, 0.4850),
        "kittens/DP802813.jpg": (199, 313, 0.7777),
        "multi-channel/chr30.4.184.jpg": (300, 215, 0.5692),
    }
    for rel, (ew, eh, emean) in expected.items():
        with open(os.path.join(_SPARK_IMAGES, rel), "rb") as fh:
            w, h, luma = decode_jpeg(fh.read())
        assert (w, h) == (ew, eh), rel
        assert len(luma) == w * h, rel
        mean = sum(luma) / (255.0 * w * h)
        assert abs(mean - emean) < 0.01, (rel, mean)


@pytest.mark.skipif(
    not os.path.isdir(_SPARK_IMAGES), reason="Spark mllib sample images absent"
)
def test_decodes_real_progressive_jpegs():
    """Round 11: real libjpeg PROGRESSIVE streams decode.  The three
    fixtures jointly exercise every scan kind (grayscale.jpg: DC first
    Al=1, AC first over two bands Al=2, AC refine Ah=2->1, DC refine,
    AC refine Ah=1->0); the stripe images are color progressive.
    Dimensions are objective; means are regression pins."""
    cases = {
        os.path.join(_SPARK_IMAGES, "multi-channel/grayscale.jpg"): (
            300, 215, 0.5574
        ),
        "/usr/share/doc/nodejs/full-white-stripe.jpg": (493, 312, 0.9813),
        "/usr/share/doc/nodejs/thin-white-stripe.jpg": (493, 58, 0.9233),
    }
    for path, (ew, eh, emean) in cases.items():
        if not os.path.exists(path):
            continue
        with open(path, "rb") as fh:
            w, h, luma = decode_jpeg(fh.read())
        assert (w, h) == (ew, eh), path
        mean = sum(luma) / (255.0 * w * h)
        assert abs(mean - emean) < 0.01, (path, mean)


@pytest.mark.skipif(
    not os.path.isdir(_SPARK_IMAGES), reason="Spark mllib sample images absent"
)
def test_progressive_twin_tracks_baseline_twin():
    """grayscale.jpg (progressive) is the grayscale re-encode of
    chr30.4.184.jpg (baseline) at identical dimensions: two different
    lossy encodings of the same photo must agree closely — a
    cross-path consistency check between the streaming baseline
    decoder and the coefficient-store progressive decoder."""
    base = os.path.join(_SPARK_IMAGES, "multi-channel")
    with open(os.path.join(base, "chr30.4.184.jpg"), "rb") as fh:
        w1, h1, a = decode_jpeg(fh.read())
    with open(os.path.join(base, "grayscale.jpg"), "rb") as fh:
        w2, h2, b = decode_jpeg(fh.read())
    assert (w1, h1) == (w2, h2) == (300, 215)
    diffs = [abs(x - y) for x, y in zip(a, b)]
    assert sum(diffs) / len(diffs) < 5.0  # same scene, different encodes


def _encode_progressive_gray(width, height, pixels, al_dc=1):
    """Test-only progressive writer over the module's own primitives:
    SOF2 + three scans — DC first at Al=al_dc, DC refine to Al=0, one
    AC 1..63 first scan (per-block EOB, run/size codes) — carrying the
    SAME quantized coefficients as the baseline encoder, so decode
    must be bit-identical to the baseline decode."""
    from datalakehouse_spark.functions import jpeg as J

    bw_blocks = (width + 7) // 8
    bh_blocks = (height + 7) // 8
    lum = [float(p) - 128.0 for p in pixels]
    blocks = []
    for brow in range(bh_blocks):
        for bcol in range(bw_blocks):
            blk = J._comp_plane_blocks(lum, width, height, brow, bcol)
            coefs = J._fdct_2d(blk)
            blocks.append([int(round(coefs[J.ZIGZAG[k]])) for k in range(64)])

    head = bytearray(b"\xff\xd8")
    head += J._dqt_segment(0, [1] * 64)
    head += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3, 8, height, width, 1)
    head += bytes([1, 0x11, 0])
    head += J._dht_segment(0, 0, J._STD_DC_LUM)
    head += J._dht_segment(1, 0, J._STD_AC_LUM)
    dc_t = J._encode_table(J._STD_DC_LUM)
    ac_t = J._encode_table(J._STD_AC_LUM)

    def sos(ss, se, ah, al):
        return b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [1, 0x00, ss, se, (ah << 4) | al]
        )

    out = bytes(head)
    # scan 1: DC first, point transform al_dc
    bw = J._BitWriter()
    pred = 0
    for zz in blocks:
        v = zz[0] >> al_dc
        diff = v - pred
        pred = v
        t = J._category(diff)
        code, length = dc_t[t]
        bw.write(code, length)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    out += sos(0, 0, 0, al_dc) + bw.flush()
    # scan 2: DC refinement down to Al=0 (one bit per block per level)
    for al in range(al_dc - 1, -1, -1):
        bw = J._BitWriter()
        for zz in blocks:
            bw.write((zz[0] >> al) & 1, 1)
        out += sos(0, 0, al + 1, al) + bw.flush()
    # scan 3: AC 1..63 first, Al=0, per-block EOB (run length 1)
    bw = J._BitWriter()
    for zz in blocks:
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_t[0xF0]
                bw.write(zc, zl)
                run -= 16
            s = J._category(v)
            code, length = ac_t[(run << 4) | s]
            bw.write(code, length)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, length = ac_t[0x00]  # EOB (run of 1 block)
            bw.write(code, length)
    out += sos(1, 63, 0, 0) + bw.flush()
    return out + b"\xff\xd9"


def test_handcrafted_progressive_matches_baseline_bitexact():
    """A progressive stream carrying the SAME quantized coefficients
    as the baseline encoder (DC split across successive-approximation
    scans, AC in one first scan) must decode to the IDENTICAL pixels —
    the coefficient store, DC refine accumulation, and AC band decode
    are exact, not approximate."""
    rng = random.Random(47)
    w, h = 24, 16
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    base = decode_jpeg(encode_jpeg(w, h, pix))
    prog = decode_jpeg(_encode_progressive_gray(w, h, pix, al_dc=1))
    assert base[:2] == prog[:2] == (w, h)
    assert base[2] == prog[2]


def test_handcrafted_progressive_constant_blocks_exact_pixels():
    vals = bytes([0, 60, 128, 255])
    w, h, pix = _block_image(vals, 4)
    got = decode_jpeg(_encode_progressive_gray(w, h, pix, al_dc=2))
    assert got == (w, h, pix)


def test_encoder_input_validation():
    with pytest.raises(JpegError):
        encode_jpeg(4, 4, b"\x00" * 15)  # wrong buffer size
    with pytest.raises(JpegError):
        encode_jpeg(4, 4, b"\x00" * 16, quant_luma=[0] * 64)
    with pytest.raises(JpegError):
        encode_jpeg(4, 4, b"\x00" * 48, color=True, subsampling="411")


def test_color_general_roundtrip_422_luma_close_to_444():
    """4:2:2 halves chroma horizontally only; luma must track the
    4:4:4 encode within chroma-rounding noise on a structured image
    (vertical color bands aligned to the 2px chroma grid -> the
    horizontal mean downsample is lossless and the decode exact)."""
    bands = [(250, 10, 10), (10, 250, 10), (10, 10, 250), (128, 128, 128)]
    w, h = 32, 16
    pix = bytearray()
    for yy in range(h):
        for xx in range(w):
            pix.extend(bands[(xx // 8) % 4])
    d444 = decode_jpeg(encode_jpeg(w, h, bytes(pix), color=True))[2]
    d422 = decode_jpeg(
        encode_jpeg(w, h, bytes(pix), color=True, subsampling="422")
    )[2]
    assert max(abs(a - b) for a, b in zip(d444, d422)) <= 1


def test_sof1_extended_sequential_decodes_like_baseline():
    """Round 12: 8-bit SOF1 (extended sequential, Huffman) is decode-
    identical to SOF0 — the extension is 12-bit samples and extra
    Huffman slots, neither of which changes the 8-bit path.  12-bit
    SOF1 still probes out."""
    import random

    from datalakehouse_spark.functions.jpeg import (
        JpegUnsupported,
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(5)
    for w, h, color in ((16, 16, False), (24, 16, True)):
        px = bytes(rng.randrange(256) for _ in range(w * h * (3 if color else 1)))
        sof0 = encode_jpeg(w, h, px, color=color)
        sof1 = sof0.replace(b"\xff\xc0", b"\xff\xc1", 1)
        assert decode_jpeg(sof1) == decode_jpeg(sof0)

    base = encode_jpeg(16, 16, bytes(256))
    at = base.find(b"\xff\xc0")
    twelve = bytearray(base.replace(b"\xff\xc0", b"\xff\xc1", 1))
    twelve[at + 4] = 12  # precision byte: marker(2) + len(2) + prec
    with pytest.raises(JpegUnsupported, match="12-bit"):
        decode_jpeg(bytes(twelve))
