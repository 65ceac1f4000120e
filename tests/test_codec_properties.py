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
