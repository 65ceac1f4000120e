"""Property-based tests for the stdlib media codecs (functions/wav.py,
functions/avi.py): encode→decode round trips over randomized inputs,
with expected features recomputed independently here.  The PNG codec
has its own property suite in test_png.py.
"""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from datalakehouse_spark.functions.avi import (
    avi_iter_frames,
    avi_video_stats,
    encode_avi,
)
from datalakehouse_spark.functions.wav import encode_wav, wav_pcm_stats


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), min_size=1, max_size=400
    ),
    rate=st.integers(min_value=1, max_value=192_000),
    n_ch=st.integers(min_value=1, max_value=4),
)
def test_wav_roundtrip_matches_independent_feature_computation(samples, rate, n_ch):
    """encode_wav quantizes to 16-bit; the decoder must report exactly
    the stats of those quantized samples — recomputed here from first
    principles (round-to-int like the encoder, /32768 like the format)."""
    # interleaving needs a whole number of frames
    samples = samples[: len(samples) - (len(samples) % n_ch)] or [0.0] * n_ch
    payload = encode_wav(samples, sample_rate=rate, n_channels=n_ch)
    got_rate, got_ch, frames, dur, rms, peak = wav_pcm_stats(payload)
    assert (got_rate, got_ch) == (rate, n_ch)
    assert frames == len(samples) // n_ch
    assert dur == frames * 1000.0 / rate

    q = [max(-32768, min(32767, int(round(s * 32767.0)))) / 32768.0 for s in samples]
    exp_rms = (sum(v * v for v in q) / len(q)) ** 0.5
    exp_peak = max(abs(v) for v in q)
    assert abs(rms - exp_rms) < 1e-12
    assert abs(peak - exp_peak) < 1e-12


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=9),
    height=st.integers(min_value=1, max_value=7),
    n_frames=st.integers(min_value=0, max_value=6),
    fps=st.integers(min_value=1, max_value=60),
    stride=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_avi_roundtrip_and_stride_sampling(width, height, n_frames, fps, stride, seed):
    """The encoder writes bottom-up BGR DIB rows with 4-byte padding;
    the decoder must hand back exactly the top-down RGB bytes that went
    in, for every frame the stride selects, at any (odd or 4-aligned)
    width."""
    rng = seed
    frames = []
    for _ in range(n_frames):
        px = bytearray()
        for _ in range(width * height * 3):
            rng = (1103515245 * rng + 12345) % (1 << 31)
            px.append(rng & 0xFF)
        frames.append(bytes(px))
    payload = encode_avi(frames, width, height, fps=fps)

    w, h, got_fps, n, dur = avi_video_stats(payload)
    assert (w, h, n) == (width, height, n_frames)
    assert got_fps == float(fps)
    assert dur == n_frames * 1000.0 / fps

    decoded = list(avi_iter_frames(payload, stride=stride))
    assert [i for i, _ in decoded] == list(range(0, n_frames, stride))
    for i, rgb in decoded:
        assert rgb == frames[i]


def test_avi_32bpp_and_topdown_normalize_to_same_fingerprint():
    """A writer using 32-bit BGRX top-down rows must fingerprint
    identically to the 24-bit bottom-up encoder for the same pixels —
    the property the frame-dedup pass relies on.  The 32bpp payload is
    assembled by hand (the fixture encoder only writes 24-bit)."""
    width, height = 3, 2
    rgb = bytes(range(width * height * 3))
    base = encode_avi([rgb], width, height, fps=5)
    (_, rgb_back), = avi_iter_frames(base)
    assert rgb_back == rgb

    # hand-build the movi frame as top-down BGRX (stride 3*4=12, no pad)
    px = bytearray()
    for r in range(height):
        row = rgb[r * width * 3 : (r + 1) * width * 3]
        for c in range(width):
            px += bytes([row[3 * c + 2], row[3 * c + 1], row[3 * c], 0])
    body = bytes(px)

    # surgically patch the 24-bit fixture: bpp 24 -> 32, height -> -height
    # (top-down), and swap the movi frame bytes
    strf_at = base.find(struct.pack("<Ii", 40, width))
    patched = bytearray(base)
    struct.pack_into("<i", patched, strf_at + 8, -height)
    struct.pack_into("<H", patched, strf_at + 14, 32)
    frame_at = base.find(b"00db")
    old_len = struct.unpack_from("<I", base, frame_at + 4)[0]
    patched[frame_at + 4 : frame_at + 8 + old_len] = (
        struct.pack("<I", len(body)) + body
    )
    # fix the RIFF and movi LIST sizes for the changed frame length
    delta = len(body) - old_len
    struct.pack_into("<I", patched, 4, struct.unpack_from("<I", base, 4)[0] + delta)
    movi_at = base.find(b"LIST" + struct.pack("<I", 0), 0)  # not reliable; recompute
    # locate the movi LIST header by scanning top-level chunks
    pos = 12
    while pos + 8 <= len(base):
        cid = base[pos : pos + 4]
        (length,) = struct.unpack_from("<I", base, pos + 4)
        if cid == b"LIST" and base[pos + 8 : pos + 12] == b"movi":
            struct.pack_into("<I", patched, pos + 4, length + delta)
            break
        pos += 8 + length + (length & 1)

    (_, rgb32), = avi_iter_frames(bytes(patched))
    assert rgb32 == rgb


# -- round 12 kernels ----------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=40),
    height=st.integers(min_value=1, max_value=12),
    color=st.booleans(),
    big_endian=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_tiff_roundtrip_property(width, height, color, big_endian, seed):
    from datalakehouse_spark.functions.tiff import decode_tiff, encode_tiff

    nch = 3 if color else 1
    px = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(width * height * nch))
    w, h, luma = decode_tiff(encode_tiff(width, height, px, color=color, big_endian=big_endian))
    assert (w, h) == (width, height)
    if not color:
        assert luma == px
    else:
        assert luma == bytes(
            (px[3 * i] * 19595 + px[3 * i + 1] * 38470 + px[3 * i + 2] * 7471 + 0x8000)
            >> 16
            for i in range(width * height)
        )


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=520),  # rows > 255 force multi-run RLE
    height=st.integers(min_value=1, max_value=5),
    bpp=st.sampled_from([4, 8]),
    absolute_prefix=st.sampled_from([0, 3, 5]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_rle_roundtrip_property(width, height, bpp, absolute_prefix, seed):
    from datalakehouse_spark.functions.bmp import decode_bmp, encode_bmp_rle

    n_idx = 1 << bpp
    pal = [((i * 7) % 256, (i * 13) % 256, (i * 29) % 256) for i in range(n_idx)]
    # mix long runs with noise so both RLE modes and 255-run splits hit
    idx = bytes(
        (seed + i // 97) % n_idx if (i % 5) else (seed * 31 + i) % n_idx
        for i in range(width * height)
    )
    if absolute_prefix and width < absolute_prefix:
        absolute_prefix = 0
    w, h, luma = decode_bmp(
        encode_bmp_rle(width, height, idx, pal, bpp=bpp, absolute_prefix=absolute_prefix)
    )
    assert (w, h) == (width, height)
    assert luma == bytes(
        (pal[i][0] * 19595 + pal[i][1] * 38470 + pal[i][2] * 7471 + 0x8000) >> 16
        for i in idx
    )


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=2000),
    height=st.integers(min_value=1, max_value=1200),
    n_frames=st.integers(min_value=0, max_value=40),
    fps=st.integers(min_value=1, max_value=120),
    webm=st.booleans(),
    laced=st.booleans(),
)
def test_mkv_stats_property(width, height, n_frames, fps, webm, laced):
    from datalakehouse_spark.functions.mkv import encode_mkv_stub, mkv_video_stats

    p = encode_mkv_stub(width, height, n_frames, fps=float(fps), webm=webm, laced_pairs=laced)
    w, h, got_fps, nf, dur = mkv_video_stats(p)
    assert (w, h, nf) == (width, height, n_frames)
    dd = round(1e9 / fps)
    assert abs(got_fps - 1e9 / dd) < 1e-9
    assert abs(dur - n_frames * dd / 1e6) < 1e-9


@settings(max_examples=40, deadline=None)
@given(
    n_samples=st.integers(min_value=0, max_value=2**40),
    rate=st.integers(min_value=1, max_value=192_000),
    channels=st.integers(min_value=1, max_value=8),
    opus=st.booleans(),
)
def test_ogg_stats_property(n_samples, rate, channels, opus):
    from datalakehouse_spark.functions.ogg import encode_ogg_stub, ogg_audio_stats

    r, ch, ns, dur = ogg_audio_stats(encode_ogg_stub(n_samples, rate, channels, opus=opus))
    exp_rate = 48000 if opus else rate
    assert (r, ch, ns) == (exp_rate, channels, n_samples)
    assert dur == n_samples * 1000.0 / exp_rate


@settings(max_examples=40, deadline=None)
@given(
    n_samples=st.integers(min_value=0, max_value=(1 << 36) - 1),
    rate=st.integers(min_value=1, max_value=(1 << 20) - 1),
    channels=st.integers(min_value=1, max_value=8),
    bps=st.sampled_from([8, 16, 24, 32]),
)
def test_flac_stats_property(n_samples, rate, channels, bps):
    from datalakehouse_spark.functions.flac import encode_flac_stub, flac_audio_stats

    r, ch, ns, dur = flac_audio_stats(
        encode_flac_stub(n_samples, rate, channels, bits_per_sample=bps)
    )
    assert (r, ch, ns) == (rate, channels, n_samples)
    assert dur == n_samples * 1000.0 / rate


@settings(max_examples=30, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=24),
    height=st.integers(min_value=1, max_value=16),
    depth=st.sampled_from([1, 2, 4]),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_subbyte_property(width, height, depth, interlace, seed):
    from datalakehouse_spark.functions.png import decode_png, encode_png

    samples = bytes((seed * 48271 + i * 137) % (1 << depth) for i in range(width * height))
    scale = 255 // ((1 << depth) - 1)
    got = decode_png(
        encode_png(width, height, samples, color_type=0, bit_depth=depth, interlace=interlace)
    )
    assert got == (width, height, bytes(v * scale for v in samples))


@settings(max_examples=40, deadline=None)
@given(
    codes=st.binary(min_size=1, max_size=300),
    law=st.sampled_from(["ulaw", "alaw"]),
    rate=st.integers(min_value=1, max_value=48_000),
)
def test_g711_decode_property(codes, law, rate):
    """Any byte string decodes through the RIFF path to exactly the
    table values; stats agree with an independent recomputation."""
    import math

    from datalakehouse_spark.functions.wav import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        encode_wav_g711,
        wav_pcm_samples,
        wav_pcm_stats,
    )

    table = _ULAW_TABLE if law == "ulaw" else _ALAW_TABLE
    payload = encode_wav_g711(codes, law, sample_rate=rate)
    r, ch, vals = wav_pcm_samples(payload)
    assert (r, ch) == (rate, 1)
    assert vals == [table[b] for b in codes]
    _, _, frames, dur, rms, peak = wav_pcm_stats(payload)
    assert frames == len(codes)
    norm = [table[b] / 32768.0 for b in codes]
    assert math.isclose(rms, (sum(v * v for v in norm) / len(norm)) ** 0.5)
    assert peak == max(abs(v) for v in norm)


@settings(max_examples=40, deadline=None)
@given(
    words=st.integers(min_value=1, max_value=40),
    predictor=st.integers(min_value=-32768, max_value=32767),
    step_index=st.integers(min_value=0, max_value=88),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_ima_adpcm_decode_property(words, predictor, step_index, seed):
    """Random nibble streams: the RIFF decode equals an independent
    walk of the published IMA state machine (clamps included)."""
    import random

    from datalakehouse_spark.functions.wav import (
        _IMA_INDEX,
        _IMA_STEPS,
        encode_wav_adpcm,
        wav_pcm_samples,
    )

    rng = random.Random(seed)
    nib = bytes(rng.randrange(256) for _ in range(4 * words))
    _, _, got = wav_pcm_samples(
        encode_wav_adpcm(nib, predictor=predictor, step_index=step_index)
    )
    pred, idx = predictor, step_index
    exp = [pred]
    for b in nib:
        for n in (b & 0x0F, b >> 4):
            step = _IMA_STEPS[idx]
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            pred = pred - diff if n & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX[n & 7]))
            exp.append(pred)
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(x=st.integers(min_value=-32768, max_value=32767))
def test_g711_encoder_quantization_property(x):
    """The write-side companders: decode(encode(x)) stays within the
    segment quantization step (<= 644 for mu-law including the spec's
    32635 clip region, <= 512 + the negative off-by-one for A-law),
    and encode(decode(c)) == c for every code except mu-law 0x7F (the
    negative-zero alias of 0xFF — G.711's two-zeros quirk)."""
    from datalakehouse_spark.functions.wav import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        linear_to_alaw,
        linear_to_ulaw,
    )

    assert abs(_ULAW_TABLE[linear_to_ulaw(x)] - x) <= 644
    assert abs(_ALAW_TABLE[linear_to_alaw(x)] - x) <= 513


def test_g711_encoder_code_identity():
    from datalakehouse_spark.functions.wav import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        linear_to_alaw,
        linear_to_ulaw,
    )

    for c in range(256):
        assert linear_to_alaw(_ALAW_TABLE[c]) == c
        if c != 0x7F:  # negative zero canonicalizes to 0xFF
            assert linear_to_ulaw(_ULAW_TABLE[c]) == c
    assert linear_to_ulaw(_ULAW_TABLE[0x7F]) == 0xFF
