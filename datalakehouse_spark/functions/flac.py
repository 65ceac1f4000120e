"""Pure-stdlib FLAC metadata parser (STREAMINFO) — round 12.

Companion to functions/ogg.py on the audio-metadata surface: FLAC PCM
synthesis needs the codec's residual decoding, but the METADATA
contract — ``(sample_rate, n_channels, n_samples, duration_ms)`` —
lives entirely in the mandatory STREAMINFO block (the first metadata
block of every FLAC file):

    fLaC magic, then blocks of [last<<7 | type : 1][length: 3 BE];
    STREAMINFO (type 0, 34 bytes) packs, after the block/frame size
    bounds, a 64-bit bitfield: sample rate (20 bits), channels-1
    (3 bits), bits-per-sample-1 (5 bits), total samples (36 bits).

A minimal writer (``encode_flac_stub``) emits fLaC + STREAMINFO (+ a
zero MD5) for fixtures and round-trip tests.

Malformed payloads raise ``FlacError`` so the corrupt->zero-row
degradation path fires.
"""

from __future__ import annotations

import struct

__all__ = ["FlacError", "flac_audio_stats", "encode_flac_stub"]


class FlacError(ValueError):
    """Malformed FLAC payload."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise FlacError(msg)


def flac_audio_stats(payload: bytes) -> tuple[int, int, int, float]:
    """``(sample_rate, n_channels, n_samples, duration_ms)`` from the
    STREAMINFO block.  A declared total of 0 means 'unknown' per spec
    and reports duration 0."""
    _expect(payload[:4] == b"fLaC", "not a FLAC stream")
    pos = 4
    while True:
        _expect(pos + 4 <= len(payload), "truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        _expect(len(body) == length, "truncated metadata block")
        if btype == 0:
            _expect(length >= 34, "STREAMINFO too short")
            # 8 bytes at offset 10: rate(20) | channels-1(3) | bps-1(5)
            # | total_samples(36)
            (packed,) = struct.unpack(">Q", body[10:18])
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            total = packed & ((1 << 36) - 1)
            _expect(rate > 0, "STREAMINFO declares zero sample rate")
            return rate, channels, total, total * 1000.0 / rate
        if last:
            break
        pos += 4 + length
    raise FlacError("no STREAMINFO block")


def encode_flac_stub(
    n_samples: int,
    sample_rate: int = 16000,
    channels: int = 1,
    bits_per_sample: int = 16,
) -> bytes:
    """fLaC + a single (last) STREAMINFO block declaring the stats; no
    audio frames (the metadata contract under test never reads them)."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (n_samples & ((1 << 36) - 1))
    )
    body = (
        struct.pack(">HH", 4096, 4096)  # min/max block size
        + b"\x00" * 6  # min/max frame size (unknown)
        + struct.pack(">Q", packed)
        + b"\x00" * 16  # md5 of unencoded audio (unset)
    )
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
