"""Pure-stdlib Ogg container metadata parser (Vorbis / Opus) — round 12.

The audio metadata pass (operators/multimodal.py ``decode_audio`` /
``extract_audio_features``) is real for WAV/PCM (full decode) and MP3
(frame-header walk); ogg previously raised the honest
``NotImplementedError``.  PCM synthesis of a Vorbis/Opus stream
genuinely needs a codec library, but the METADATA contract —
``(sample_rate, n_channels, n_samples, duration_ms)``, the mp3-style
rate/duration tuple — is plain container arithmetic (RFC 3533):

- every Ogg page is ``OggS`` + version + header_type +
  granule_position (little-endian int64) + serial + sequence + crc +
  segment table; packets are the concatenated segments,
- the FIRST packet of the stream identifies the codec:
  ``\\x01vorbis`` (identification header: channels, sample rate) or
  ``OpusHead`` (channels, pre-skip, input rate; Opus granules always
  tick at 48 kHz),
- the LAST page's granule_position is the total PCM sample count
  (absolute position after the page) — duration falls out without
  touching a single codec packet.  Opus subtracts its pre-skip.

A minimal writer (``encode_ogg_stub``) emits a structurally valid
two-page stream — identification-header page + an EOS data page whose
granule carries the declared sample count — with REAL page checksums
(the Ogg CRC-32, polynomial 0x04C11DB7, unreflected, zero init/xor),
so the fixtures would survive a strict third-party reader.

Malformed payloads raise ``OggError`` so the corrupt->zero-row
degradation path fires.
"""

from __future__ import annotations

import struct

__all__ = ["OggError", "ogg_audio_stats", "encode_ogg_stub"]


class OggError(ValueError):
    """Malformed or unsupported Ogg payload."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise OggError(msg)


_CRC_TABLE = []


def _crc_table() -> list[int]:
    if not _CRC_TABLE:
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            _CRC_TABLE.append(r & 0xFFFFFFFF)
    return _CRC_TABLE


def _ogg_crc(data: bytes) -> int:
    tbl = _crc_table()
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tbl[((crc >> 24) & 0xFF) ^ b]
    return crc


def _pages(data: bytes):
    """Yield ``(header_type, granule, body_start, body_len, nsegs)``
    for each page."""
    pos = 0
    while pos < len(data):
        _expect(data[pos : pos + 4] == b"OggS", f"bad page capture at {pos}")
        _expect(pos + 27 <= len(data), "truncated page header")
        version = data[pos + 4]
        _expect(version == 0, f"unsupported Ogg version {version}")
        header_type = data[pos + 5]
        (granule,) = struct.unpack("<q", data[pos + 6 : pos + 14])
        nsegs = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + nsegs]
        _expect(len(seg_table) == nsegs, "truncated segment table")
        body_len = sum(seg_table)
        body_start = pos + 27 + nsegs
        _expect(body_start + body_len <= len(data), "truncated page body")
        yield header_type, granule, body_start, body_len
        pos = body_start + body_len


def ogg_audio_stats(payload: bytes) -> tuple[int, int, int, float]:
    """``(sample_rate, n_channels, n_samples, duration_ms)`` of an Ogg
    Vorbis or Ogg Opus stream — container metadata only, no codec
    packets decoded."""
    _expect(payload[:4] == b"OggS", "not an Ogg stream")
    first_packet = None
    last_granule = 0
    for header_type, granule, s, length, in _pages(payload):
        if first_packet is None:
            first_packet = payload[s : s + length]
        if granule >= 0:  # -1 marks a page with no finished packet
            last_granule = max(last_granule, granule)
    _expect(first_packet is not None, "empty Ogg stream")

    if first_packet[:7] == b"\x01vorbis":
        _expect(len(first_packet) >= 16, "truncated Vorbis id header")
        channels = first_packet[11]
        (rate,) = struct.unpack("<I", first_packet[12:16])
        n_samples = last_granule
    elif first_packet[:8] == b"OpusHead":
        _expect(len(first_packet) >= 12, "truncated OpusHead")
        channels = first_packet[9]
        (pre_skip,) = struct.unpack("<H", first_packet[10:12])
        rate = 48000  # Opus granules always tick at 48 kHz
        n_samples = max(0, last_granule - pre_skip)
    else:
        raise OggError("unrecognized Ogg codec (not Vorbis/Opus)")
    _expect(rate > 0, "zero sample rate")
    return rate, channels, n_samples, n_samples * 1000.0 / rate


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------


def _page(
    body: bytes, header_type: int, granule: int, serial: int, seq: int
) -> bytes:
    segs = []
    left = len(body)
    while left >= 255:
        segs.append(255)
        left -= 255
    segs.append(left)  # final short (possibly 0) segment terminates
    header = (
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # crc placeholder
        + bytes([len(segs)])
        + bytes(segs)
    )
    page = header + body
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def encode_ogg_stub(
    n_samples: int,
    sample_rate: int = 8000,
    channels: int = 1,
    opus: bool = False,
    serial: int = 1,
) -> bytes:
    """Two-page fixture: BOS page carrying the codec identification
    header, then an EOS page with one fake data packet whose granule
    position declares ``n_samples`` total PCM samples (Opus: at 48 kHz
    plus the canonical 312-sample pre-skip)."""
    if opus:
        pre_skip = 312
        ident = (
            b"OpusHead\x01"
            + bytes([channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)  # input rate, informational
            + struct.pack("<hB", 0, 0)
        )
        granule = n_samples + pre_skip
    else:
        ident = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", sample_rate)
            + struct.pack("<iii", 0, 0, 0)
            + b"\x01"
        )
        granule = n_samples
    bos = _page(ident, header_type=0x02, granule=0, serial=serial, seq=0)
    eos = _page(b"\xaa" * 4, header_type=0x04, granule=granule, serial=serial, seq=1)
    return bos + eos
