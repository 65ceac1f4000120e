"""Pure-stdlib MP4 / ISO BMFF metadata parser — the video-metadata
kernel for the container format most real corpora actually carry.

The multimodal video path (operators/multimodal.py ``decode_video`` /
``extract_video_features``) has been REAL for AVI/BI_RGB since round
9; MP4 previously raised the honest ``NotImplementedError``.  Full
pixel decode of an MP4 genuinely needs a codec library (H.264/H.265
entropy decode is out of scope for a stdlib kernel, and
``sample_frames`` keeps its probe guard), but the METADATA pass —
``(width, height, fps, n_frames, duration_ms)``, the same contract as
``avi.avi_video_stats`` — needs nothing beyond ``struct``: walk the
ISO base-media box tree (ISO/IEC 14496-12: every box is
``[size:4][type:4][payload]``, 1 -> 64-bit largesize, 0 -> to end of
enclosing box), find the first video ``trak``, and read

- ``tkhd``  -> presentation width/height (16.16 fixed point),
- ``mdhd``  -> media timescale + duration,
- ``hdlr``  -> handler type (``vide`` selects the video track),
- ``stsz``/``stz2`` -> sample (frame) count,
- ``stts``  -> decode deltas: total sample duration for the fps
  estimate ``n_frames * timescale / total_delta``.

A minimal writer (``encode_mp4_stub``) builds a structurally valid
ftyp+moov+mdat file for fixtures and round-trip tests — the samples
are fake (an ``avc1`` entry with no codec config is enough for the
metadata contract under test).

Malformed payloads raise ``Mp4Error`` so the multimodal
corrupt->zero-row degradation path fires; an MP4 with no video track
is also ``Mp4Error`` (it is decodable, there is just nothing to
report).
"""

from __future__ import annotations

import struct

__all__ = ["Mp4Error", "mp4_video_stats", "encode_mp4_stub"]

#: brands whose files this parser accepts (any ftyp is fine really —
#: the walker only needs the box grammar — but a present ftyp must be
#: sane)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class Mp4Error(ValueError):
    """Malformed or video-track-less MP4 payload."""


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4Error(f"box {btype!r} overruns its container")
        yield btype, body, pos + size
        pos += size
    if pos != end:
        raise Mp4Error("trailing bytes after last box")


def _find(data: bytes, start: int, end: int, *path: bytes):
    """All (body_start, body_end) spans reached by descending ``path``
    through container boxes."""
    spans = [(start, end)]
    for name in path:
        nxt = []
        for s, e in spans:
            for btype, bs, be in _boxes(data, s, e):
                if btype == name:
                    nxt.append((bs, be))
        spans = nxt
    return spans


def _fullbox(data: bytes, s: int) -> tuple[int, int]:
    """(version, flags) of a full box starting at body offset s."""
    if s + 4 > len(data):
        raise Mp4Error("truncated full box")
    return data[s], int.from_bytes(data[s + 1 : s + 4], "big")


def mp4_video_stats(payload: bytes) -> tuple[int, int, float, int, float]:
    """``(width, height, fps, n_frames, duration_ms)`` of the FIRST
    video track — the ``avi_video_stats`` contract for ISO BMFF.

    fps derives from the stts decode deltas (n_frames * timescale /
    total_delta); duration_ms from the same media clock.  A file whose
    video track declares zero samples reports fps 0 / duration 0
    rather than dividing by a zero delta."""
    if len(payload) < 8:
        raise Mp4Error("not an MP4: too short")
    # accept files starting with any top-level box, but require the
    # canonical magic when an ftyp is first (offset 4..8 == 'ftyp')
    if payload[4:8] not in (b"ftyp", b"moov", b"mdat", b"free", b"wide", b"styp"):
        raise Mp4Error("not an MP4: no ISO BMFF box at offset 0")

    for trak_s, trak_e in _find(payload, 0, len(payload), b"moov", b"trak"):
        # handler must be video
        is_video = False
        for s, e in _find(payload, trak_s, trak_e, b"mdia"):
            for btype, bs, be in _boxes(payload, s, e):
                if btype == b"hdlr" and payload[bs + 8 : bs + 12] == b"vide":
                    is_video = True
        if not is_video:
            continue

        width = height = 0
        for btype, bs, be in _boxes(payload, trak_s, trak_e):
            if btype == b"tkhd":
                ver, _ = _fullbox(payload, bs)
                # width/height are the LAST 8 bytes regardless of version
                w_fx, h_fx = struct.unpack(">II", payload[be - 8 : be])
                width, height = w_fx >> 16, h_fx >> 16

        timescale = 0
        for s, e in _find(payload, trak_s, trak_e, b"mdia"):
            for btype, bs, be in _boxes(payload, s, e):
                if btype == b"mdhd":
                    ver, _ = _fullbox(payload, bs)
                    off = bs + 4
                    if ver == 1:
                        (timescale,) = struct.unpack(
                            ">I", payload[off + 16 : off + 20]
                        )
                    else:
                        (timescale,) = struct.unpack(
                            ">I", payload[off + 8 : off + 12]
                        )

        n_frames = 0
        total_delta = 0
        for s, e in _find(
            payload, trak_s, trak_e, b"mdia", b"minf", b"stbl"
        ):
            for btype, bs, be in _boxes(payload, s, e):
                if btype == b"stsz":
                    sample_size, count = struct.unpack(
                        ">II", payload[bs + 4 : bs + 12]
                    )
                    n_frames = count
                elif btype == b"stz2":
                    (count,) = struct.unpack(">I", payload[bs + 8 : bs + 12])
                    n_frames = count
                elif btype == b"stts":
                    (entries,) = struct.unpack(">I", payload[bs + 4 : bs + 8])
                    p = bs + 8
                    if p + 8 * entries > be:
                        raise Mp4Error("truncated stts")
                    for _ in range(entries):
                        cnt, delta = struct.unpack(">II", payload[p : p + 8])
                        total_delta += cnt * delta
                        p += 8

        if timescale and total_delta:
            duration_ms = total_delta * 1000.0 / timescale
            fps = n_frames * timescale / total_delta
        else:
            duration_ms = 0.0
            fps = 0.0
        return width, height, fps, n_frames, duration_ms

    raise Mp4Error("no video track in MP4")


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------


def _box(btype: bytes, *payloads: bytes) -> bytes:
    body = b"".join(payloads)
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_mp4_stub(
    width: int,
    height: int,
    n_frames: int,
    fps: float = 30.0,
    timescale: int = 600,
) -> bytes:
    """Structurally valid ftyp+moov+mdat fixture: one ``vide`` track
    with tkhd/mdhd/hdlr and an stbl declaring ``n_frames`` samples of
    uniform duration at ``fps`` — no real codec payload (``avc1``
    sample entry without decoder config; mdat is empty), which is all
    the METADATA contract under test requires."""
    delta = max(1, round(timescale / fps)) if fps else 0
    duration = n_frames * delta
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isomiso2mp41")
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07",  # version 0, enabled|in_movie|in_preview
        struct.pack(">IIII", 0, 0, 1, 0),  # times, track id 1, reserved
        struct.pack(">I", duration),
        b"\x00" * 8,  # reserved
        struct.pack(">hhhh", 0, 0, 0, 0),  # layer, group, volume, pad
        # identity matrix
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00",
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(
        b"hdlr",
        b"\x00\x00\x00\x00",
        struct.pack(">I", 0),
        b"vide",
        b"\x00" * 12,
        b"VideoHandler\x00",
    )
    avc1 = _box(
        b"avc1",
        b"\x00" * 6,
        struct.pack(">H", 1),  # data_reference_index
        b"\x00" * 16,
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x480000, 0x480000),  # 72 dpi
        struct.pack(">I", 0),
        struct.pack(">H", 1),  # frame count per sample
        b"\x00" * 32,  # compressor name
        struct.pack(">Hh", 24, -1),  # depth, color table
    )
    stsd = _box(b"stsd", b"\x00\x00\x00\x00", struct.pack(">I", 1), avc1)
    stts = _box(
        b"stts",
        b"\x00\x00\x00\x00",
        struct.pack(">I", 1 if n_frames else 0),
        (struct.pack(">II", n_frames, delta) if n_frames else b""),
    )
    stsz = _box(
        b"stsz",
        b"\x00\x00\x00\x00",
        struct.pack(">II", 0, n_frames),  # per-sample sizes follow
        b"".join(struct.pack(">I", 0) for _ in range(n_frames)),
    )
    stsc = _box(
        b"stsc", b"\x00\x00\x00\x00", struct.pack(">I", 0)
    )
    stco = _box(
        b"stco", b"\x00\x00\x00\x00", struct.pack(">I", 0)
    )
    stbl = _box(b"stbl", stsd, stts, stsz, stsc, stco)
    vmhd = _box(b"vmhd", b"\x00\x00\x00\x01", b"\x00" * 8)
    dinf = _box(
        b"dinf",
        _box(
            b"dref",
            b"\x00\x00\x00\x00",
            struct.pack(">I", 1),
            _box(b"url ", b"\x00\x00\x00\x01"),
        ),
    )
    minf = _box(b"minf", vmhd, dinf, stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00",
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">IH H", 0x10000, 0x0100, 0),  # rate, volume, pad
        b"\x00" * 8,
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        b"\x00" * 24,
        struct.pack(">I", 2),  # next track id
    )
    moov = _box(b"moov", mvhd, trak)
    mdat = _box(b"mdat")
    return ftyp + moov + mdat
