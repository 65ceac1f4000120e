"""MPEG audio frame-header parser (functions/mp3.py, round 11).

Coverage: stub round trips across rates/bitrates/channel modes, ID3v2
skip + ID3v1 trailer, mixed-bitrate (VBR-style) chains, padding-bit
frame lengths, MPEG-2 sample counts, malformed rejection (free
format, reserved indices, truncation, mid-stream clock change), and
the decode_audio / extract_audio_features dispatch over mixed
WAV + MP3 + corrupt payloads."""

import math

import pytest

from datalakehouse_spark.functions.mp3 import (
    Mp3Error,
    _parse_header,
    encode_mp3_stub,
    mp3_audio_stats,
)


def test_stub_roundtrip():
    rate, ch, mpeg, samples, dur = mp3_audio_stats(encode_mp3_stub(38))
    assert (rate, ch, mpeg, samples) == (44100, 2, 38, 38 * 1152)
    assert abs(dur - 38 * 1152 * 1000.0 / 44100) < 1e-9


def test_stub_roundtrip_variants():
    for n, rate, kbps, stereo in [
        (1, 44100, 32, True),
        (10, 48000, 320, False),
        (100, 32000, 128, True),
    ]:
        got = mp3_audio_stats(encode_mp3_stub(n, rate, kbps, stereo=stereo))
        assert got[:4] == (rate, 1 if not stereo else 2, n, n * 1152)


def test_id3v2_skip_and_id3v1_trailer():
    body = encode_mp3_stub(7)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 30]) + b"\x00" * 30
    full = id3v2 + body + b"TAG" + b"\x00" * 125
    assert mp3_audio_stats(full)[:4] == (44100, 2, 7, 7 * 1152)


def test_mixed_bitrate_vbr_chain():
    d = encode_mp3_stub(3, 44100, 128) + encode_mp3_stub(2, 44100, 320)
    rate, ch, mpeg, samples, _ = mp3_audio_stats(d)
    assert (rate, mpeg, samples) == (44100, 5, 5 * 1152)


def test_padding_bit_lengthens_frame():
    d = bytearray(encode_mp3_stub(1, 44100, 128))
    fb0, *_ = _parse_header(bytes(d), 0)
    d[2] |= 0x02  # set padding bit
    fb1, *_ = _parse_header(bytes(d), 0)
    assert fb1 == fb0 + 1


def test_mpeg2_sample_count():
    # hand-build an MPEG-2 Layer III header: sync, version 2 (bits 10),
    # layer III (01), bitrate idx 1 (8 kbps), 22050 Hz, mono
    h = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) | (1 << 12) | (3 << 6)
    fb, rate, ch, samples = _parse_header(h.to_bytes(4, "big") + b"\x00" * 4, 0)
    assert (rate, ch, samples) == (22050, 1, 576)
    assert fb == 72 * 8000 // 22050


def test_malformed_rejection():
    good = encode_mp3_stub(3)
    with pytest.raises(Mp3Error):
        mp3_audio_stats(b"")
    with pytest.raises(Mp3Error, match="sync"):
        mp3_audio_stats(b"not audio" + good)
    with pytest.raises(Mp3Error, match="truncated"):
        mp3_audio_stats(good[:-5])
    # free-format bitrate
    bad = bytearray(good)
    bad[2] &= 0x0F
    with pytest.raises(Mp3Error, match="free-format"):
        mp3_audio_stats(bytes(bad))
    # clock change mid-stream
    mixed = encode_mp3_stub(2, 44100, 128) + encode_mp3_stub(2, 48000, 128)
    with pytest.raises(Mp3Error, match="sample rate changes"):
        mp3_audio_stats(mixed)


def test_decode_audio_dispatch():
    """WAV decodes fully; MP3 reports real metadata with NaN rms/peak;
    other compressed audio keeps the probe guard; corrupt MP3 raises
    the codec error (degradation path)."""
    from datalakehouse_spark.functions.wav import encode_wav
    from datalakehouse_spark.operators.multimodal import decode_audio

    rate, ch, frames, dur, rms, peak = decode_audio(
        encode_wav([0.0, 0.5, -0.5], sample_rate=8000)
    )
    assert (rate, frames) == (8000, 3) and not math.isnan(rms)

    rate, ch, frames, dur, rms, peak = decode_audio(encode_mp3_stub(5))
    assert (rate, ch, frames) == (44100, 2, 5 * 1152)
    assert abs(dur - 5 * 1152 * 1000.0 / 44100) < 1e-9
    assert math.isnan(rms) and math.isnan(peak)

    with pytest.raises(Mp3Error):
        decode_audio(encode_mp3_stub(5)[:-9])
    from datalakehouse_spark.functions.flac import FlacError
    from datalakehouse_spark.functions.ogg import OggError

    # round 12: ogg/flac magics route to their REAL metadata walkers
    with pytest.raises(OggError):
        decode_audio(b"OggS vorbis-ish bytes")
    with pytest.raises(FlacError):
        decode_audio(b"fLaC flac-ish bytes")


def test_extract_audio_features_mixed_wav_mp3(spark):
    """The mapInPandas stats pass dispatches per payload: WAV rows get
    signal stats, MP3 rows get real metadata with NaN rms/peak,
    corrupt rows degrade."""
    from datalakehouse_spark.functions.wav import encode_wav
    from datalakehouse_spark.operators.multimodal import extract_audio_features

    wav = encode_wav([0.25] * 16, sample_rate=16000)
    mp3 = encode_mp3_stub(4, 48000, 64, stereo=False)
    rows = [
        (1, "audio", wav),
        (2, "audio", mp3),
        (3, "audio", b"\xff\xe0 truncated mp3-ish"),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r for r in extract_audio_features(df).collect()}
    assert got[1]["sample_rate"] == 16000 and got[1]["rms"] is not None
    assert (got[2]["sample_rate"], got[2]["n_channels"]) == (48000, 1)
    assert got[2]["n_frames"] == 4 * 1152
    assert got[2]["rms"] is None or math.isnan(got[2]["rms"])
    assert got[3]["n_frames"] == 0
