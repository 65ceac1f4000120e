"""Pure-stdlib Matroska/WebM (EBML) metadata parser — round 12.

The video metadata pass (operators/multimodal.py ``decode_video`` /
``extract_video_features``) is real for RIFF AVI (round 9) and
ISO-BMFF MP4 (round 11); mkv/webm previously raised the honest
``NotImplementedError``.  Full pixel decode genuinely needs a codec
library (the payloads are VP8/VP9/AV1/H.264 bitstreams), but the
METADATA contract — ``(width, height, fps, n_frames, duration_ms)``,
same tuple as ``avi.avi_video_stats`` / ``mp4.mp4_video_stats`` —
needs nothing beyond integer arithmetic: EBML (RFC 8794) is a
length-prefixed element tree,

    [element id: vint, marker kept][size: vint, marker stripped][body]

and the stats live in well-known elements:

- ``Segment/Info``      -> TimestampScale (ns per tick, default 1e6)
                           and Duration (float, ticks),
- ``Segment/Tracks``    -> the first TrackEntry with TrackType 1
                           (video): TrackNumber, DefaultDuration
                           (ns per frame), Video/PixelWidth+PixelHeight,
- ``Segment/Cluster*``  -> frame count: SimpleBlock / BlockGroup-Block
                           elements whose leading vint names the video
                           track, lacing-aware (a laced block carries
                           ``1 + next byte`` frames).

Unknown-size elements (all size bits set — streamed Segments do this)
extend to the end of the enclosing element, per the RFC.

A minimal writer (``encode_mkv_stub``) builds a structurally valid
EBML header + Segment for fixtures and round-trip tests (fake 1-byte
block payloads — the metadata contract under test never reads them).

Malformed payloads raise ``MkvError`` so the multimodal
corrupt->zero-row degradation path fires; a file with no video track
is also ``MkvError``.

Scale note: called per payload inside Arrow-batched ``mapInPandas``;
one linear walk over the element tree, no allocation proportional to
payload size.
"""

from __future__ import annotations

import struct

__all__ = ["MkvError", "mkv_video_stats", "encode_mkv_stub", "MKV_MAGIC"]

MKV_MAGIC = b"\x1a\x45\xdf\xa3"

# element ids (marker bit kept, as serialized)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1


class MkvError(ValueError):
    """Malformed or unsupported Matroska payload."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise MkvError(msg)


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int, bool]:
    """Read one variable-length integer at ``pos``.  Returns
    ``(value, next_pos, all_ones)`` — ``all_ones`` marks the
    unknown-size sentinel (every value bit set)."""
    _expect(pos < len(data), "truncated vint")
    first = data[pos]
    _expect(first != 0, "vint longer than 8 bytes")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    _expect(pos + length <= len(data), "truncated vint body")
    value = first if keep_marker else first & (mask - 1)
    for i in range(1, length):
        value = (value << 8) | data[pos + i]
    all_ones = (not keep_marker) and value == (1 << (7 * length)) - 1
    return value, pos + length, all_ones


def _elements(data: bytes, pos: int, end: int):
    """Yield ``(element_id, body_start, body_end)`` over a run of EBML
    elements; unknown-size bodies extend to ``end``."""
    while pos < end:
        eid, pos, _ = _read_vint(data, pos, keep_marker=True)
        size, pos, unknown = _read_vint(data, pos, keep_marker=False)
        body_end = end if unknown else pos + size
        _expect(body_end <= end, "element overruns its parent")
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big")


def _float(data: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", data[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", data[s:e])[0]
    raise MkvError(f"bad float width {e - s}")


def _block_frames(data: bytes, s: int, e: int) -> tuple[int, int]:
    """(track_number, n_frames) of a (Simple)Block body: leading track
    vint, 2-byte relative timestamp, flags; lacing (flags bits 1-2)
    packs ``1 + next byte`` frames into the block."""
    track, pos, _ = _read_vint(data, s, keep_marker=False)
    _expect(pos + 3 <= e, "truncated block header")
    flags = data[pos + 2]
    lacing = (flags >> 1) & 0x03
    if lacing == 0:
        return track, 1
    _expect(pos + 4 <= e, "truncated laced block")
    return track, 1 + data[pos + 3]


def mkv_video_stats(payload: bytes) -> tuple[int, int, float, int, float]:
    """``(width, height, fps, n_frames, duration_ms)`` of the FIRST
    video track — the ``avi_video_stats`` contract for Matroska/WebM.

    fps prefers the track's DefaultDuration (ns/frame); otherwise it
    derives from the counted frames over the segment Duration.
    duration_ms comes from Info.Duration x TimestampScale, falling
    back to n_frames x DefaultDuration."""
    _expect(payload[:4] == MKV_MAGIC, "not EBML: bad magic")

    segment = None
    for eid, s, e in _elements(payload, 0, len(payload)):
        if eid == _SEGMENT:
            segment = (s, e)
            break
    _expect(segment is not None, "no Segment element")

    scale = 1_000_000  # ns per tick, spec default
    duration_ticks = None
    width = height = 0
    default_duration = 0
    video_track = None
    n_frames = 0
    # clusters may legally PRECEDE Tracks in streamed/live Matroska
    # (ADVICE r12), so collect their ranges during the walk and count
    # blocks once the video track number is resolved
    cluster_ranges: list[tuple[int, int]] = []

    for eid, s, e in _elements(payload, segment[0], segment[1]):
        if eid == _INFO:
            for iid, is_, ie in _elements(payload, s, e):
                if iid == _TIMESTAMP_SCALE:
                    scale = _uint(payload, is_, ie)
                elif iid == _DURATION:
                    duration_ticks = _float(payload, is_, ie)
        elif eid == _TRACKS and video_track is None:
            for tid, ts, te in _elements(payload, s, e):
                if tid != _TRACK_ENTRY or video_track is not None:
                    continue
                t_num, t_type, dd, w, h = None, None, 0, 0, 0
                for fid, fs, fe in _elements(payload, ts, te):
                    if fid == _TRACK_NUMBER:
                        t_num = _uint(payload, fs, fe)
                    elif fid == _TRACK_TYPE:
                        t_type = _uint(payload, fs, fe)
                    elif fid == _DEFAULT_DURATION:
                        dd = _uint(payload, fs, fe)
                    elif fid == _VIDEO:
                        for vid, vs, ve in _elements(payload, fs, fe):
                            if vid == _PIXEL_WIDTH:
                                w = _uint(payload, vs, ve)
                            elif vid == _PIXEL_HEIGHT:
                                h = _uint(payload, vs, ve)
                if t_type == 1:
                    video_track = t_num
                    default_duration = dd
                    width, height = w, h
        elif eid == _CLUSTER:
            cluster_ranges.append((s, e))

    _expect(video_track is not None, "no video track in Matroska file")

    for s, e in cluster_ranges:
        for cid, cs, ce in _elements(payload, s, e):
            if cid == _SIMPLE_BLOCK:
                track, nf = _block_frames(payload, cs, ce)
                if track == video_track:
                    n_frames += nf
            elif cid == _BLOCK_GROUP:
                for gid, gs, ge in _elements(payload, cs, ce):
                    if gid == _BLOCK:
                        track, nf = _block_frames(payload, gs, ge)
                        if track == video_track:
                            n_frames += nf

    if duration_ticks is not None:
        duration_ms = duration_ticks * scale / 1e6
    elif default_duration:
        duration_ms = n_frames * default_duration / 1e6
    else:
        duration_ms = 0.0
    if default_duration:
        fps = 1e9 / default_duration
    elif duration_ms:
        fps = n_frames * 1000.0 / duration_ms
    else:
        fps = 0.0
    return width, height, fps, n_frames, duration_ms


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------


def _enc_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is the unknown sentinel
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise MkvError("size too large")


def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _elem(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(body)) + body


def _elem_uint(eid: int, v: int) -> bytes:
    return _elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv_stub(
    width: int,
    height: int,
    n_frames: int,
    fps: float = 25.0,
    webm: bool = False,
    laced_pairs: bool = False,
) -> bytes:
    """Structurally valid EBML header + Segment fixture: one video
    TrackEntry (TrackNumber 1, DefaultDuration from ``fps``) and one
    Cluster carrying ``n_frames`` fake frames — as single SimpleBlocks,
    or (``laced_pairs``, for lacing-count tests) Xiph-laced blocks of
    two frames each plus a trailing single when odd."""
    doc = b"webm" if webm else b"matroska"
    header = _elem(
        0x1A45DFA3,
        _elem_uint(0x4286, 1)  # EBMLVersion
        + _elem_uint(0x42F7, 1)  # EBMLReadVersion
        + _elem_uint(0x42F2, 4)  # EBMLMaxIDLength
        + _elem_uint(0x42F3, 8)  # EBMLMaxSizeLength
        + _elem(0x4282, doc)  # DocType
        + _elem_uint(0x4287, 2)
        + _elem_uint(0x4285, 2),
    )
    dd = int(round(1e9 / fps)) if fps else 0
    duration_ticks = n_frames * dd / 1e6  # ticks at the default 1e6 scale
    info = _elem(
        _INFO,
        _elem_uint(_TIMESTAMP_SCALE, 1_000_000)
        + _elem(_DURATION, struct.pack(">d", duration_ticks)),
    )
    video = _elem(
        _VIDEO, _elem_uint(_PIXEL_WIDTH, width) + _elem_uint(_PIXEL_HEIGHT, height)
    )
    entry = _elem(
        _TRACK_ENTRY,
        _elem_uint(_TRACK_NUMBER, 1)
        + _elem_uint(_TRACK_TYPE, 1)
        + (_elem_uint(_DEFAULT_DURATION, dd) if dd else b"")
        + video,
    )
    tracks = _elem(_TRACKS, entry)

    blocks = []
    if laced_pairs:
        left = n_frames
        while left > 0:
            if left >= 2:
                # Xiph lacing, 2 frames: flags 0x02, frame count-1 = 1,
                # one size byte (first frame = 1 byte), then payloads
                body = b"\x81" + b"\x00\x00" + b"\x02" + b"\x01" + b"\x01" + b"\xaa\xbb"
                left -= 2
            else:
                body = b"\x81" + b"\x00\x00" + b"\x00" + b"\xaa"
                left -= 1
            blocks.append(_elem(_SIMPLE_BLOCK, body))
    else:
        for _ in range(n_frames):
            blocks.append(_elem(_SIMPLE_BLOCK, b"\x81" + b"\x00\x00" + b"\x00" + b"\xaa"))
    cluster = _elem(_CLUSTER, _elem_uint(0xE7, 0) + b"".join(blocks))

    segment = _elem(_SEGMENT, info + tracks + cluster)
    return header + segment
