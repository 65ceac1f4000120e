"""Pure-stdlib WAV (RIFF/PCM) codec — the real audio-decode kernel.

Companion to functions/png.py: the multimodal operators need a REAL
audio path, and WAV/PCM is fully decodable with ``struct`` alone —
parse the RIFF chunk stream, read ``fmt `` (PCM, IEEE-float, or
WAVE_FORMAT_EXTENSIBLE wrapping either), and fold the ``data`` chunk
into per-payload features.  No dependencies, runs on any executor's
bare CPython; deployments that decode compressed audio (mp3/ogg/flac)
install a codec library — this kernel rejects those loudly (the honest
probe contract, same as non-PNG images without Pillow).

Supported sample formats: unsigned 8-bit, signed 16/24/32-bit PCM, and
32/64-bit IEEE float, any channel count, via either the plain PCM
format tag (1), the float tag (3), or EXTENSIBLE (0xFFFE) with the
matching subformat GUID.  Rejected loudly: compressed format tags
(mu-law, ADPCM, mp3, ...), truncated chunks, missing fmt/data.

Features are computed over samples normalized to [-1, 1] and pooled
across channels: RMS and peak absolute amplitude (peak == 1.0 is the
clip-triage signal; silence is rms == 0).  All arithmetic is a single
left-to-right pass over the payload, so the result is deterministic
for a given byte string on any platform.

A minimal encoder (``encode_wav``, 16-bit PCM) is included for fixture
generation and round-trip tests.

Scale note: called per payload inside Arrow-batched ``mapInPandas`` —
pure-CPython loops, so ~10-50x slower per second of audio than a C
codec; it exists for correctness and portability.  The struct.unpack
of the whole data chunk at once (not per-sample) keeps the constant
factor tolerable (~1e7 samples/s).
"""

from __future__ import annotations

import struct

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE

# first two bytes of the 16-byte subformat GUID in an EXTENSIBLE fmt
_SUBFORMAT = {_PCM: _PCM, _IEEE_FLOAT: _IEEE_FLOAT}


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def _chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise WavError("truncated chunk")
        yield cid, body
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def _parse_fmt(body: bytes) -> tuple[int, int, int, int]:
    """Return (format_tag, n_channels, sample_rate, bits_per_sample)."""
    if len(body) < 16:
        raise WavError("fmt chunk too short")
    tag, n_ch, rate, _byte_rate, _align, bits = struct.unpack("<HHIIHH", body[:16])
    if tag == _EXTENSIBLE:
        if len(body) < 40:
            raise WavError("EXTENSIBLE fmt chunk too short")
        (sub,) = struct.unpack("<H", body[24:26])
        if sub not in _SUBFORMAT:
            raise WavError(f"unsupported EXTENSIBLE subformat {sub}")
        tag = _SUBFORMAT[sub]
    if tag not in (_PCM, _IEEE_FLOAT):
        raise WavError(
            f"compressed WAV format tag {tag} needs a codec library; "
            "the stdlib kernel handles PCM/float only"
        )
    if n_ch == 0 or rate == 0:
        raise WavError("zero channels or sample rate")
    return tag, n_ch, rate, bits


def _samples(tag: int, bits: int, body: bytes) -> tuple[list[float], int]:
    """Decode the data chunk to normalized floats; returns (values, n)."""
    if tag == _IEEE_FLOAT:
        if bits not in (32, 64):
            raise WavError(f"float WAV with {bits} bits")
        width = bits // 8
        n = len(body) // width
        return list(struct.unpack(f"<{n}{'f' if bits == 32 else 'd'}", body[: n * width])), n
    if bits == 8:  # unsigned, 128-centered
        return [(b - 128) / 128.0 for b in body], len(body)
    if bits == 16:
        n = len(body) // 2
        return [v / 32768.0 for v in struct.unpack(f"<{n}h", body[: n * 2])], n
    if bits == 24:
        n = len(body) // 3
        vals = []
        for i in range(n):
            b = body[3 * i : 3 * i + 3]
            v = b[0] | (b[1] << 8) | (b[2] << 16)
            if v >= 1 << 23:
                v -= 1 << 24
            vals.append(v / 8388608.0)
        return vals, n
    if bits == 32:
        n = len(body) // 4
        return [v / 2147483648.0 for v in struct.unpack(f"<{n}i", body[: n * 4])], n
    raise WavError(f"unsupported PCM bit depth {bits}")


def wav_pcm_stats(payload: bytes) -> tuple[int, int, int, float, float, float]:
    """REAL audio decode: ``(sample_rate, n_channels, n_frames,
    duration_ms, rms, peak)`` of a WAV payload.

    ``n_frames`` counts multi-channel frames (sample instants); ``rms``
    and ``peak`` pool across channels on normalized [-1, 1] samples.
    """
    fmt = None
    data = None
    for cid, body in _chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = _parse_fmt(body)
        elif cid == b"data" and data is None:
            data = body
    if fmt is None:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    tag, n_ch, rate, bits = fmt
    vals, n = _samples(tag, bits, data)
    frames = n // n_ch
    if n == 0:
        return rate, n_ch, 0, 0.0, 0.0, 0.0
    acc = 0.0
    peak = 0.0
    for v in vals:
        acc += v * v
        a = v if v >= 0 else -v
        if a > peak:
            peak = a
    rms = (acc / n) ** 0.5
    return rate, n_ch, frames, frames * 1000.0 / rate, rms, peak


def encode_wav(
    samples: list[float], sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM encoder for fixtures: ``samples`` are
    normalized floats in [-1, 1], interleaved when multi-channel."""
    ints = [
        max(-32768, min(32767, int(round(s * 32767.0)))) for s in samples
    ]
    data = struct.pack(f"<{len(ints)}h", *ints)
    fmt = struct.pack(
        "<HHIIHH",
        _PCM,
        n_channels,
        sample_rate,
        sample_rate * n_channels * 2,
        n_channels * 2,
        16,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
