"""Pure-stdlib AVI (RIFF) video codec — the real video-decode kernel.

Completes the modality set next to functions/png.py (images) and
functions/wav.py (audio): AVI with uncompressed BI_RGB frames is fully
decodable with ``struct`` alone — parse the RIFF chunk tree
(``hdrl`` → ``avih``/``strh``/``strf`` headers, ``movi`` → per-frame
``##db``/``##dc`` chunks, optionally grouped in ``rec `` LISTs), read
the BITMAPINFOHEADER, and expose each video frame as top-down RGB
bytes.  No dependencies, runs on any executor's bare CPython;
deployments that decode compressed video (h264/vp9/mjpeg...) install
ffmpeg — this kernel rejects those fourccs loudly (the honest probe
contract, same as compressed audio in wav.py).

Supported: BI_RGB (biCompression == 0) at 24 or 32 bits per pixel,
bottom-up (positive height, the DIB default) or top-down (negative
height) scanlines, any frame rate expressed either as the stream
header's rate/scale or the main header's microseconds-per-frame.
Rejected loudly: any non-zero biCompression / non-``vids`` decode
request, truncated chunks, missing headers.

Frame bytes are normalized to TOP-DOWN RGB with no row padding, so the
md5 of a decoded frame is identical regardless of how the writer chose
bpp/row order — the property the frame-fingerprint dedup pass needs.

A minimal encoder (``encode_avi``, 24-bit BI_RGB) is included for
fixture generation and round-trip tests.

Scale note: called per payload inside Arrow-batched ``mapInPandas``;
the per-frame work is one ``bytes`` reassembly per scanline (no
per-pixel Python loop for 24-bit input), so throughput is bounded by
memcpy, not arithmetic.
"""

from __future__ import annotations

import struct
from typing import Iterator

BI_RGB = 0


class AviError(ValueError):
    """Malformed or unsupported AVI payload."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise AviError(msg)


def _chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_len) over a RIFF chunk run."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        _expect(pos + 8 + length <= end, "truncated chunk")
        yield cid, pos + 8, length
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def _parse_headers(data: bytes) -> tuple[int, int, float, int, int, int, int]:
    """Return (width, height, fps, n_frames_declared, bpp, compression,
    stream_idx) for the FIRST ``vids`` stream — ``stream_idx`` is its
    ordinal among the ``strl`` lists, which is the ``##`` prefix its
    movi chunks carry (a second stream's ``01db`` frames must never be
    decoded with stream 0's geometry).  The movi walk is separate so
    stats never touch frame bytes."""
    _expect(
        len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ",
        "not an AVI: bad RIFF/AVI header",
    )
    avih = None
    vids: tuple[int, int] | None = None  # (rate, scale) of the vids stream
    strf: bytes | None = None
    vids_idx = -1
    stream_no = -1
    for cid, start, length in _chunks(data, 12, len(data)):
        if cid != b"LIST" or data[start : start + 4] != b"hdrl":
            continue
        for hcid, hstart, hlen in _chunks(data, start + 4, start + length):
            if hcid == b"avih" and avih is None:
                _expect(hlen >= 40, "avih too short")
                avih = struct.unpack("<10I", data[hstart : hstart + 40])
            elif hcid == b"LIST" and data[hstart : hstart + 4] == b"strl":
                stream_no += 1
                if strf is not None:
                    continue  # vids stream already captured
                is_vids = False
                for scid, sstart, slen in _chunks(
                    data, hstart + 4, hstart + hlen
                ):
                    if scid == b"strh":
                        _expect(slen >= 32, "strh too short")
                        is_vids = data[sstart : sstart + 4] == b"vids"
                        scale, rate = struct.unpack(
                            "<II", data[sstart + 20 : sstart + 28]
                        )
                        if is_vids:
                            vids = (rate, scale)
                            vids_idx = stream_no
                    elif scid == b"strf" and is_vids:
                        strf = data[sstart : sstart + slen]
        break  # hdrl is the first LIST; one pass is enough
    _expect(avih is not None, "missing avih header")
    _expect(strf is not None, "missing vids strf (no video stream)")
    _expect(len(strf) >= 24, "BITMAPINFOHEADER too short")
    _, w, h, _planes, bpp, compression = struct.unpack("<IiiHHI", strf[:20])
    usec_per_frame, _, _, _flags, total_frames = avih[:5]
    if vids and vids[1]:
        fps = vids[0] / vids[1]
    elif usec_per_frame:
        fps = 1e6 / usec_per_frame
    else:
        fps = 0.0
    return w, h, fps, total_frames, bpp, compression, vids_idx


def _movi_frames(data: bytes, stream_idx: int) -> Iterator[tuple[int, int]]:
    """Yield (start, length) of each frame chunk of stream
    ``stream_idx`` (``##db`` raw / ``##dc`` "compressed" slot, which
    BI_RGB writers also use; ``##`` is the zero-padded stream ordinal),
    walking into ``rec `` grouping LISTs.  Audio (``##wb``) and other
    streams' chunks are skipped."""
    prefix = b"%02d" % stream_idx

    def walk(pos: int, end: int) -> Iterator[tuple[int, int]]:
        for cid, start, length in _chunks(data, pos, end):
            if cid == b"LIST" and data[start : start + 4] == b"rec ":
                yield from walk(start + 4, start + length)
            elif cid[2:4] in (b"db", b"dc") and cid[:2] == prefix:
                yield start, length

    for cid, start, length in _chunks(data, 12, len(data)):
        if cid == b"LIST" and data[start : start + 4] == b"movi":
            yield from walk(start + 4, start + length)


def _swap_rb(row: bytes, px_bytes: int) -> bytes:
    """BGR(X) row → unpadded RGB24 via slice assignment (memcpy-bound,
    no per-pixel Python loop)."""
    n_px = len(row) // px_bytes
    out = bytearray(n_px * 3)
    out[0::3] = row[2::px_bytes]
    out[1::3] = row[1::px_bytes]
    out[2::3] = row[0::px_bytes]
    return bytes(out)


def _frame_rgb(body: bytes, width: int, height: int, bpp: int) -> bytes:
    """One DIB frame → top-down, unpadded RGB24 bytes."""
    top_down = height < 0
    h = -height if top_down else height
    px = bpp // 8
    stride = ((width * px) + 3) & ~3  # DIB rows pad to 4 bytes
    _expect(len(body) >= stride * h, "frame chunk shorter than dimensions")
    rows = []
    for r in range(h):
        src = r if top_down else h - 1 - r
        rows.append(_swap_rb(body[src * stride : src * stride + width * px], px))
    return b"".join(rows)


def avi_video_stats(payload: bytes) -> tuple[int, int, float, int, float]:
    """REAL video decode (metadata pass): ``(width, height, fps,
    n_frames, duration_ms)`` of an AVI payload.  ``n_frames`` counts the
    vids stream's actual ``movi`` chunks (the declared avih total is
    advisory and wrong in the wild); no frame bytes are touched.
    Compressed fourccs parse fine here — rejecting them is the FRAME
    reader's job."""
    w, h, fps, _declared, _bpp, _comp, vids_idx = _parse_headers(payload)
    n = sum(1 for _ in _movi_frames(payload, vids_idx))
    return abs(w), abs(h), fps, n, (n * 1000.0 / fps if fps else 0.0)


def avi_iter_frames(
    payload: bytes, stride: int = 1
) -> Iterator[tuple[int, bytes]]:
    """Yield ``(frame_idx, rgb_bytes)`` for every ``stride``-th frame of
    the vids stream, normalized to top-down unpadded RGB24.  Raises
    :class:`AviError` for compressed streams (biCompression != 0) and
    unsupported bit depths — the honest probe contract."""
    w, h, _fps, _n, bpp, compression, vids_idx = _parse_headers(payload)
    if compression != BI_RGB:
        raise AviError(
            f"compressed AVI (biCompression={compression:#x}) needs a codec "
            "library (ffmpeg); the stdlib kernel handles BI_RGB only"
        )
    _expect(bpp in (24, 32), f"unsupported BI_RGB bit depth {bpp}")
    _expect(stride >= 1, "stride must be >= 1")
    for idx, (start, length) in enumerate(_movi_frames(payload, vids_idx)):
        if idx % stride:
            continue
        yield idx, _frame_rgb(payload[start : start + length], w, h, bpp)


def encode_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal 24-bit BI_RGB encoder for fixtures: each frame is
    top-down unpadded RGB24 bytes (``width * height * 3``), written
    bottom-up BGR with DIB row padding — i.e. deliberately NOT the
    decoder's normalized layout, so round-trip tests prove the
    normalization."""
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    movi = [b"movi"]
    for rgb in frames:
        _expect(len(rgb) == width * height * 3, "frame size mismatch")
        rows = []
        for r in range(height - 1, -1, -1):  # bottom-up
            row = rgb[r * width * 3 : (r + 1) * width * 3]
            rows.append(_swap_rb(row, 3) + pad)  # RGB<->BGR is symmetric
        body = b"".join(rows)
        movi.append(b"00db" + struct.pack("<I", len(body)) + body)
        if len(body) & 1:
            movi.append(b"\x00")
    movi_blob = b"".join(movi)

    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, BI_RGB, stride * height, 0, 0, 0, 0
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), stride * height, 0, 0
        )
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strl = b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf
    avih = struct.pack(
        "<10I",
        int(1e6 // fps) if fps else 0,
        0,
        0,
        0,
        len(frames),
        0,
        1,
        stride * height,
        width,
        height,
    ) + b"\x00" * 16
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl += b"LIST" + struct.pack("<I", len(strl)) + strl
    body = (
        b"AVI "
        + b"LIST"
        + struct.pack("<I", len(hdrl))
        + hdrl
        + b"LIST"
        + struct.pack("<I", len(movi_blob))
        + movi_blob
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
