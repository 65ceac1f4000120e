"""Round-13 FLAC PCM synthesis: full frame decode (Rice residuals,
fixed + LPC predictors, stereo decorrelation, wasted bits, escape
partitions), the STREAMINFO MD5 self-check, loud CRC/parse errors, and
the decode_audio dispatch upgrade."""

import itertools
import random
import struct

import pytest

from datalakehouse_spark.functions.flac import (
    FlacError,
    encode_flac,
    encode_flac_stub,
    flac_decode_pcm,
    flac_pcm_stats,
)


def _check(chans, **kw):
    payload = encode_flac(chans, **kw)
    rate, nch, bps, inter, md5_ok = flac_decode_pcm(payload)
    n = len(chans[0])
    expect = [chans[c][i] for i in range(n) for c in range(len(chans))]
    assert inter == expect
    assert md5_ok is True, "STREAMINFO MD5 must verify the decoded PCM"
    assert nch == len(chans)
    return len(payload)


def test_flac_roundtrip_mono_shapes():
    rng = random.Random(5)
    for n in (1, 5, 192, 1000, 9000):
        _check([[rng.randrange(-2000, 2000) + i % 97 for i in range(n)]], block_size=512)
        _check([[42] * n])  # CONSTANT subframes
        _check([[1000 * ((i * 7) % 50) - 20000 for i in range(n)]])


def test_flac_compresses_smooth_signals():
    smooth = [[(i % 200) * 300 - 30000 for i in range(8000)]]
    assert _check(smooth) < 8000 * 2


def test_flac_stereo_decorrelation_all_modes():
    rng = random.Random(7)
    L = [rng.randrange(-30000, 30000) for _ in range(3000)]
    R = [l - rng.randrange(-100, 100) for l in L]  # correlated channels
    sizes = {}
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        sizes[mode] = _check([L, R], stereo_mode=mode, block_size=1000)
    # decorrelation does real work: every side mode beats independent
    assert all(sizes[m] < sizes["independent"] for m in
               ("left_side", "right_side", "mid_side")), sizes


def test_flac_bit_depths_and_odd_rate():
    rng = random.Random(9)
    for bps in (8, 12, 16, 24):
        lim = 1 << (bps - 1)
        _check([[rng.randrange(-lim, lim) for _ in range(700)]], bps=bps, block_size=256)
    # a rate outside the code table uses the 16-bit-follows header form
    _check([[1, 2, 3] * 50], sample_rate=12345)


def test_flac_exotic_decoder_paths():
    """LPC subframes, partitioned residuals, 5-bit Rice, escape
    partitions, wasted bits — every combination round-trips."""
    smooth = [[((i * 13) % 400) * 80 - 16000 for i in range(2048)]]
    for lpc, p_ord, meth, esc, wst in itertools.product(
        (False, True), (0, 3), (0, 1), (False, True), (False, True)
    ):
        _check(
            smooth,
            block_size=1024,
            lpc=lpc,
            partition_order=p_ord,
            rice_method=meth,
            force_escape=esc,
            use_wasted=wst,
        )


def test_flac_wasted_bits_actually_compress():
    shifted = [[((((i * 13) % 400) * 80 - 16000) & ~0x7) for i in range(1500)]]
    assert _check(shifted, block_size=512, use_wasted=True) < _check(
        shifted, block_size=512
    )


def test_flac_pcm_stats_contract():
    rate, ch, bps, n, checksum, md5_ok = flac_pcm_stats(
        encode_flac([[5, -5, 7, 0]], sample_rate=8000)
    )
    assert (rate, ch, bps, n) == (8000, 1, 16, 4)
    assert checksum == 1 * 5 + 2 * -5 + 3 * 7 + 4 * 0
    assert md5_ok is True


def test_flac_errors_are_loud():
    good = encode_flac([[100, -100] * 300], block_size=256)
    # corrupt one byte inside the first frame: CRC must catch it
    si_end = 4 + 4 + 34
    bad = bytearray(good)
    bad[si_end + 20] ^= 0x40
    with pytest.raises(FlacError):
        flac_decode_pcm(bytes(bad))
    # truncated frame region
    with pytest.raises(FlacError):
        flac_decode_pcm(good[:-3])
    # header-only stub declares samples it doesn't carry
    with pytest.raises(FlacError):
        flac_decode_pcm(encode_flac_stub(100))
    with pytest.raises(FlacError):
        flac_decode_pcm(b"fLaX" + good[4:])


def test_flac_md5_mismatch_detected():
    good = bytearray(encode_flac([[7, 8, 9] * 100], block_size=256))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the stream
    md5_at = 4 + 4 + 18
    good[md5_at] ^= 0xFF
    rate, ch, bps, inter, md5_ok = flac_decode_pcm(bytes(good))
    assert md5_ok is False


def test_decode_audio_dispatches_full_flac_pcm():
    """The multimodal audio kernel now reports real rms/peak for FLAC
    payloads, and still falls back to the metadata pass for the
    header-only stub fixtures."""
    import math

    from datalakehouse_spark.operators.multimodal import decode_audio

    samples = [20000, -20000] * 400
    payload = encode_flac([samples], sample_rate=16000, block_size=256)
    rate, ch, frames, dur, rms, peak = decode_audio(payload)
    assert (rate, ch, frames) == (16000, 1, 800)
    assert dur == pytest.approx(50.0)
    assert peak == pytest.approx(20000 / 32768.0)
    assert rms == pytest.approx(20000 / 32768.0)

    rate, ch, frames, dur, rms, peak = decode_audio(encode_flac_stub(320, 16000))
    assert (rate, ch, frames) == (16000, 1, 320)
    assert math.isnan(rms) and math.isnan(peak)


def test_flac_wav_rms_parity():
    """The SAME samples through WAV and FLAC report the same
    rate/frames/duration and matching rms/peak (both normalize to
    [-1, 1])."""
    from datalakehouse_spark.functions.wav import encode_wav
    from datalakehouse_spark.operators.multimodal import decode_audio

    ints = [12000, -9000, 3000, 0, -32000, 31000] * 50
    flac_out = decode_audio(encode_flac([ints], sample_rate=8000, block_size=256))
    wav_out = decode_audio(encode_wav([v / 32767.0 for v in ints], 8000))
    assert flac_out[0] == wav_out[0] and flac_out[2] == wav_out[2]
    # encode_wav re-quantizes via round(s * 32767), so values differ by
    # <= 1 lsb; rms/peak agree to that tolerance
    assert flac_out[4] == pytest.approx(wav_out[4], abs=2e-4)
    assert flac_out[5] == pytest.approx(wav_out[5], abs=2e-4)
