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
matching subformat GUID.  Round 13 adds the three telephony/legacy
codecs that are pure integer math per the PUBLIC specs — G.711 A-law
(tag 6) and mu-law (tag 7) companding (ITU-T G.711 segment decode,
the classic ~((m<<3)+0x84)<<e expansion), and IMA/DVI ADPCM (tag
0x11): 4-byte per-channel block headers (the predictor IS sample 0),
low-nibble-first 4-bit deltas through the standard 89-entry step
table with clamped predictor/index state.  Rejected loudly:
everything else compressed (mp3, GSM, ...), truncated chunks,
missing fmt/data.

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
_ALAW = 6
_ULAW = 7
_IMA_ADPCM = 0x11
_EXTENSIBLE = 0xFFFE

# first two bytes of the 16-byte subformat GUID in an EXTENSIBLE fmt
_SUBFORMAT = {_PCM: _PCM, _IEEE_FLOAT: _IEEE_FLOAT, _ALAW: _ALAW, _ULAW: _ULAW}

# G.711 decode tables, generated once from the segment formulas (the
# public ITU-T G.711 expansion — every decoder ships these 256 values)


def _ulaw2linear(u: int) -> int:
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw2linear(a: int) -> int:
    a ^= 0x55
    seg = (a & 0x70) >> 4
    man = a & 0x0F
    t = (man << 4) + 8 if seg == 0 else ((man << 4) + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_ULAW_TABLE = [_ulaw2linear(u) for u in range(256)]
_ALAW_TABLE = [_alaw2linear(a) for a in range(256)]


def linear_to_ulaw(sample: int) -> int:
    """G.711 mu-law compressor (the classic Sun/CCITT routine): int16
    in, code byte out.  Inverse of the decode table up to segment
    quantization; exact on decoded values (encode(decode(c)) == c for
    all 256 codes)."""
    sample = max(-32768, min(32767, sample))
    sign = 0x80 if sample < 0 else 0
    if sample < 0:
        sample = -sample
    sample = min(sample, 32635) + 0x84
    exp = 7
    mask = 0x4000
    while exp > 0 and not sample & mask:
        exp -= 1
        mask >>= 1
    mantissa = (sample >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mantissa) & 0xFF


def linear_to_alaw(sample: int) -> int:
    """G.711 A-law compressor: int16 in, code byte out.  Matches the
    decode table exactly on decoded values."""
    sample = max(-32768, min(32767, sample))
    sign = 0x80 if sample >= 0 else 0
    if sample < 0:
        sample = -sample - 1  # A-law encodes negatives off by one LSB
    sample = min(sample, 32767)
    if sample < 256:
        code = sample >> 4
    else:
        exp = 7
        mask = 0x4000
        while exp > 1 and not sample & mask:
            exp -= 1
            mask >>= 1
        mantissa = (sample >> (exp + 3)) & 0x0F
        code = (exp << 4) | mantissa
    return (sign | code) ^ 0x55

# IMA/DVI ADPCM (the public IMA spec's tables — identical in every
# implementation from the 1992 recommendation onward)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: (pred, idx) -> (pred', idx')."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nibble & 7]))
    return pred, idx


def _ima_decode_block(block: bytes, n_ch: int) -> list[int]:
    """Decode one ADPCM block -> interleaved int16 samples.  Layout per
    the IMA WAV mapping: a 4-byte header per channel (int16 predictor
    — emitted as the first sample — uint8 step index, reserved), then
    4-byte data words round-robin across channels, each holding 8
    nibbles (low nibble first) for that channel."""
    if len(block) < 4 * n_ch:
        raise WavError("ADPCM block shorter than its headers")
    preds, idxs, chans = [], [], []
    for c in range(n_ch):
        pred, idx = struct.unpack("<hB", block[4 * c : 4 * c + 3])
        if idx > 88:
            raise WavError(f"ADPCM step index {idx} out of range")
        preds.append(pred)
        idxs.append(idx)
        chans.append([pred])
    body = block[4 * n_ch :]
    if len(body) % (4 * n_ch):
        raise WavError("ADPCM data words not channel-aligned")
    for w in range(0, len(body), 4 * n_ch):
        for c in range(n_ch):
            for b in body[w + 4 * c : w + 4 * c + 4]:
                for nib in (b & 0x0F, b >> 4):
                    preds[c], idxs[c] = _ima_step(nib, preds[c], idxs[c])
                    chans[c].append(preds[c])
    out = []
    for i in range(len(chans[0])):
        for c in range(n_ch):
            out.append(chans[c][i])
    return out


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


def _parse_fmt(body: bytes) -> tuple[int, int, int, int, int]:
    """Return (format_tag, n_channels, sample_rate, bits_per_sample,
    block_align)."""
    if len(body) < 16:
        raise WavError("fmt chunk too short")
    tag, n_ch, rate, _byte_rate, align, bits = struct.unpack("<HHIIHH", body[:16])
    if tag == _EXTENSIBLE:
        if len(body) < 40:
            raise WavError("EXTENSIBLE fmt chunk too short")
        (sub,) = struct.unpack("<H", body[24:26])
        if sub not in _SUBFORMAT:
            raise WavError(f"unsupported EXTENSIBLE subformat {sub}")
        tag = _SUBFORMAT[sub]
    if tag not in (_PCM, _IEEE_FLOAT, _ALAW, _ULAW, _IMA_ADPCM):
        raise WavError(
            f"compressed WAV format tag {tag} needs a codec library; "
            "the stdlib kernel handles PCM/float/G.711/IMA-ADPCM only"
        )
    if tag in (_ALAW, _ULAW) and bits != 8:
        raise WavError(f"G.711 WAV must be 8-bit, got {bits}")
    if tag == _IMA_ADPCM:
        if bits != 4:
            raise WavError(f"IMA ADPCM WAV must be 4-bit, got {bits}")
        if align < 4 * max(n_ch, 1):
            raise WavError(f"IMA ADPCM block align {align} too small")
    if n_ch == 0 or rate == 0:
        raise WavError("zero channels or sample rate")
    return tag, n_ch, rate, bits, align


def _samples(
    tag: int, bits: int, body: bytes, n_ch: int = 1, align: int = 0
) -> tuple[list[float], int]:
    """Decode the data chunk to normalized floats; returns (values, n)."""
    if tag == _ULAW:
        return [_ULAW_TABLE[b] / 32768.0 for b in body], len(body)
    if tag == _ALAW:
        return [_ALAW_TABLE[b] / 32768.0 for b in body], len(body)
    if tag == _IMA_ADPCM:
        vals: list[float] = []
        for off in range(0, len(body), align):
            block = body[off : off + align]
            if len(block) < 4 * n_ch:
                break  # trailing ragged block: spec-legal padding
            vals.extend(v / 32768.0 for v in _ima_decode_block(block, n_ch))
        return vals, len(vals)
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
    tag, n_ch, rate, bits, align = fmt
    vals, n = _samples(tag, bits, data, n_ch=n_ch, align=align)
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


def wav_pcm_samples(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode -> ``(sample_rate, n_channels, int16_samples)`` —
    un-normalized integers for bit-exact oracle comparison (the
    normalized floats in :func:`wav_pcm_stats` are these / 32768)."""
    fmt = None
    data = None
    for cid, body in _chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = _parse_fmt(body)
        elif cid == b"data" and data is None:
            data = body
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    tag, n_ch, rate, bits, align = fmt
    vals, _ = _samples(tag, bits, data, n_ch=n_ch, align=align)
    return rate, n_ch, [int(round(v * 32768.0)) for v in vals]


def _wav_wrap(fmt: bytes, data: bytes) -> bytes:
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


def encode_wav_g711(
    codes: bytes, law: str = "ulaw", sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """G.711 fixture writer: ``codes`` are raw companded bytes written
    verbatim as the data chunk (one code per sample)."""
    tag = {"ulaw": _ULAW, "alaw": _ALAW}.get(law)
    if tag is None:
        raise WavError(f"law must be ulaw or alaw, got {law!r}")
    fmt = struct.pack(
        "<HHIIHH", tag, n_channels, sample_rate,
        sample_rate * n_channels, n_channels, 8,
    )
    return _wav_wrap(fmt, codes)


def encode_wav_adpcm(
    nibbles: bytes,
    sample_rate: int = 8000,
    predictor: int = 0,
    step_index: int = 0,
) -> bytes:
    """Mono IMA ADPCM fixture writer: one block whose header carries
    ``predictor``/``step_index`` and whose data words are ``nibbles``
    verbatim (must be a multiple of 4 bytes — the spec's word size).
    samples_per_block = 1 + 2*len(nibbles)."""
    if len(nibbles) % 4:
        raise WavError("ADPCM nibble payload must be 4-byte words")
    if not -32768 <= predictor <= 32767 or not 0 <= step_index <= 88:
        raise WavError("ADPCM initial state out of range")
    align = 4 + len(nibbles)
    spb = 1 + 2 * len(nibbles)
    fmt = struct.pack(
        "<HHIIHHHH", _IMA_ADPCM, 1, sample_rate,
        (sample_rate * align + spb - 1) // spb, align, 4, 2, spb,
    )
    data = struct.pack("<hBB", predictor, step_index, 0) + nibbles
    return _wav_wrap(fmt, data)


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
