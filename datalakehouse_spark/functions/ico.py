"""Pure-stdlib ICO/CUR decoder — the favicon format every web scrape
carries (round 13).

An ICO file is a 6-byte ICONDIR (reserved 0, type 1 ICO / 2 CUR,
count) followed by 16-byte ICONDIRENTRY records (width, height — 0
means 256 — palette size, planes/hotspot-x, bpp/hotspot-y, byte size,
offset) and the image payloads.  Each payload is either

- a complete PNG stream (Vista+ icons — detected by magic and handed
  to functions/png.py), or
- a DIB: a BITMAPINFOHEADER with DOUBLED height covering the XOR
  (color) plane and a trailing 1-bit AND (transparency) mask, with no
  BITMAPFILEHEADER.  The decoder synthesizes the missing 14-byte file
  header (computing the pixel offset from the header + color table),
  halves the height back, and hands the result to functions/bmp.py —
  every BMP profile the kernel knows (1/4/8-bit palettized, 16-bit
  555/565, 24/32-bit) works inside an ICO for free.

``decode_ico`` picks the LARGEST image in the directory (the choice a
thumbnailer makes) and returns the shared image-kernel contract
``(width, height, luma_plane)``.  The AND mask is ignored for luma —
the same alpha-ignoring convention the PNG (gray+alpha) and BMP
(BGRX) paths use.  Malformed payloads raise ``IcoError``.

``encode_ico`` writes fixtures: a directory of PNG and/or DIB images
(DIBs built from ``encode_bmp*`` output by stripping the file header,
doubling the height, and appending a zero AND mask).
"""

from __future__ import annotations

import struct

from datalakehouse_spark.functions.bmp import BmpError, decode_bmp
from datalakehouse_spark.functions.png import PngError, decode_png

__all__ = ["IcoError", "decode_ico", "ico_luma_stats", "encode_ico"]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class IcoError(ValueError):
    """Malformed or unsupported ICO/CUR payload."""


def _entries(data: bytes):
    if len(data) < 6:
        raise IcoError("not an ICO: too short")
    reserved, kind, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or kind not in (1, 2):
        raise IcoError("not an ICO/CUR: bad ICONDIR")
    if count == 0:
        raise IcoError("ICO directory is empty")
    out = []
    for i in range(count):
        at = 6 + 16 * i
        if at + 16 > len(data):
            raise IcoError("truncated ICONDIRENTRY table")
        w, h = data[at], data[at + 1]
        size, offset = struct.unpack("<II", data[at + 8 : at + 16])
        if offset + size > len(data):
            raise IcoError("image payload out of range")
        out.append((w or 256, h or 256, data[offset : offset + size]))
    return out


def _decode_dib(payload: bytes) -> tuple[int, int, bytes]:
    """DIB-in-ICO -> luma plane: synthesize the BITMAPFILEHEADER,
    halve the XOR+AND doubled height, reuse the BMP kernel."""
    if len(payload) < 40:
        raise IcoError("DIB header too short")
    (hdr_size,) = struct.unpack("<I", payload[:4])
    if hdr_size < 40:
        raise IcoError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack("<ii", payload[4:12])
    _planes, bpp = struct.unpack("<HH", payload[12:16])
    (compression,) = struct.unpack("<I", payload[16:20])
    if height % 2:
        raise IcoError("ICO DIB height must be doubled (XOR + AND planes)")
    (n_colors,) = struct.unpack("<I", payload[32:36])
    palette_bytes = 0
    if bpp <= 8:
        palette_bytes = 4 * (n_colors or (1 << bpp))
    masks_bytes = 12 if compression == 3 else 0
    pixel_off = 14 + hdr_size + masks_bytes + palette_bytes
    dib = bytearray(payload)
    struct.pack_into("<i", dib, 8, height // 2)  # XOR plane only
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + len(dib), 0, 0, pixel_off)
        + bytes(dib)
    )
    try:
        return decode_bmp(bmp)
    except BmpError as exc:
        raise IcoError(f"ICO DIB: {exc}") from exc


def decode_ico(data: bytes) -> tuple[int, int, bytes]:
    """Decode the LARGEST directory image -> ``(width, height,
    luma_plane)`` (the shared image-kernel contract)."""
    best = max(_entries(data), key=lambda e: e[0] * e[1])
    payload = best[2]
    if payload[:8] == _PNG_MAGIC:
        try:
            return decode_png(payload)
        except PngError as exc:
            raise IcoError(f"ICO PNG: {exc}") from exc
    return _decode_dib(payload)


def ico_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` kernel
    contract."""
    width, height, luma = decode_ico(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def encode_ico(images, cur: bool = False) -> bytes:
    """Fixture writer.  ``images`` is a list of ``(width, height,
    payload, kind)`` where ``kind`` is ``"png"`` (payload = a complete
    PNG stream) or ``"bmp"`` (payload = ``encode_bmp*`` output — the
    14-byte file header is stripped, the height doubled, and a zero
    AND mask appended, exactly the on-disk ICO DIB shape)."""
    if not images:
        raise IcoError("ICO needs at least one image")
    blobs = []
    dir_entries = []
    offset = 6 + 16 * len(images)
    for width, height, payload, kind in images:
        if kind == "png":
            if payload[:8] != _PNG_MAGIC:
                raise IcoError("png image payload is not a PNG stream")
            blob = payload
        elif kind == "bmp":
            if payload[:2] != b"BM":
                raise IcoError("bmp image payload is not a BMP file")
            dib = bytearray(payload[14:])
            (hdr_size,) = struct.unpack("<I", dib[:4])
            w, h = struct.unpack("<ii", dib[4:12])
            if (w, abs(h)) != (width, height):
                raise IcoError("bmp dimensions disagree with directory entry")
            struct.pack_into("<i", dib, 8, h * 2)  # declare the AND plane
            and_stride = ((width + 31) // 32) * 4
            blob = bytes(dib) + b"\x00" * (and_stride * height)
        else:
            raise IcoError(f"unknown image kind {kind!r}")
        if not (1 <= width <= 256 and 1 <= height <= 256):
            raise IcoError("ICO images are 1..256 pixels per side")
        dir_entries.append(
            bytes([width % 256, height % 256, 0, 0])
            + struct.pack("<HHII", 1, 32, len(blob), offset)
        )
        blobs.append(blob)
        offset += len(blob)
    return (
        struct.pack("<HHH", 0, 2 if cur else 1, len(images))
        + b"".join(dir_entries)
        + b"".join(blobs)
    )
