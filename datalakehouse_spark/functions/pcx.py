"""Pure-stdlib ZSoft PCX decoder (round 13).

PCX is the retro-graphics interchange format old corpora carry: a
128-byte header (magic 0x0A, version, encoding, bits-per-plane,
window, planes, bytes-per-line) and RLE-compressed scanlines (a byte
with the top two bits set is a run count 1..63 for the next byte;
runs never cross the plane-line boundary in well-formed files but
this decoder fills count-wise, as real writers emit).

Supported: 8-bit single-plane (grayscale or VGA-palettized — the
256-color palette trails the file after a 0x0C marker), 1-bit
single-plane (black/white), and 8-bit 3-plane RGB (planes R, G, B per
scanline).  Luma uses the house ITU-R 601-2 integer formula.
Rejected loudly: EGA multi-plane bit depths, encoding values other
than 1 (uncompressed PCX is nonstandard), missing VGA palette when
one is required.

``decode_pcx`` -> ``(width, height, luma_plane)``; ``encode_pcx``
writes RLE fixtures for all three profiles.
"""

from __future__ import annotations

import struct

__all__ = ["PcxError", "decode_pcx", "pcx_luma_stats", "encode_pcx"]


class PcxError(ValueError):
    """Malformed or unsupported PCX payload."""


def _rle_decode(
    data: bytes, pos: int, n_out: int, carry: bytes = b""
) -> tuple[bytearray, int, bytes]:
    # Fills count-wise: a run that overflows past n_out is NOT
    # discarded — the excess is returned as ``carry`` and prepended to
    # the next scanline, matching writers whose runs cross line
    # boundaries.
    out = bytearray(carry)
    while len(out) < n_out:
        if pos >= len(data):
            raise PcxError("PCX RLE stream exhausted")
        b = data[pos]
        pos += 1
        if b >= 0xC0:
            if pos >= len(data):
                raise PcxError("truncated PCX RLE run")
            out += bytes([data[pos]]) * (b & 0x3F)
            pos += 1
        else:
            out.append(b)
    return out[:n_out], pos, bytes(out[n_out:])


def decode_pcx(data: bytes) -> tuple[int, int, bytes]:
    """Decode -> ``(width, height, luma_plane)`` top-down row-major."""
    if len(data) < 128 or data[0] != 0x0A:
        raise PcxError("not a PCX: bad magic or too short")
    version, encoding, bpp = data[1], data[2], data[3]
    xmin, ymin, xmax, ymax = struct.unpack("<4H", data[4:12])
    planes = data[65]
    (bpl,) = struct.unpack("<H", data[66:68])
    if encoding != 1:
        raise PcxError(f"PCX encoding {encoding} not supported (RLE only)")
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    if width <= 0 or height <= 0:
        raise PcxError("bad PCX window")
    profile = (bpp, planes)
    if profile not in ((8, 1), (8, 3), (1, 1)):
        raise PcxError(
            f"PCX {bpp}-bit x {planes}-plane not supported "
            "(need 8x1, 8x3, or 1x1)"
        )
    if bpl < (width * bpp + 7) // 8:
        raise PcxError("bytes-per-line smaller than the window")

    pos = 128
    n = width * height
    luma = bytearray(n)

    carry = b""
    if profile == (1, 1):
        for r in range(height):
            row, pos, carry = _rle_decode(data, pos, bpl, carry)
            base = r * width
            for x in range(width):
                bit = (row[x >> 3] >> (7 - (x & 7))) & 1
                luma[base + x] = 255 if bit else 0
        return width, height, bytes(luma)

    if profile == (8, 3):
        for r in range(height):
            row, pos, carry = _rle_decode(data, pos, 3 * bpl, carry)
            base = r * width
            for x in range(width):
                rr, gg, bb = row[x], row[bpl + x], row[2 * bpl + x]
                luma[base + x] = (
                    rr * 19595 + gg * 38470 + bb * 7471 + 0x8000
                ) >> 16
        return width, height, bytes(luma)

    # 8-bit single plane: indices; the VGA palette (0x0C + 768 bytes)
    # trails the pixel data — absent palette means grayscale identity
    idx = bytearray(n)
    for r in range(height):
        row, pos, carry = _rle_decode(data, pos, bpl, carry)
        idx[r * width : (r + 1) * width] = row[:width]
    # the VGA palette sits at EXACTLY len-769 (0x0C marker + 768
    # bytes) — searching for 0x0C would false-match palette bytes
    if len(data) >= pos + 769 and data[len(data) - 769] == 0x0C:
        pal = data[len(data) - 768 :]
        lut = bytes(
            (pal[3 * i] * 19595 + pal[3 * i + 1] * 38470
             + pal[3 * i + 2] * 7471 + 0x8000) >> 16
            for i in range(256)
        )
        return width, height, bytes(lut[v] for v in idx)
    return width, height, bytes(idx)


def pcx_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` kernel
    contract."""
    width, height, luma = decode_pcx(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def _rle_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(row):
        j = i + 1
        while j < len(row) and j - i < 63 and row[j] == row[i]:
            j += 1
        count = j - i
        if count > 1 or row[i] >= 0xC0:
            out += bytes([0xC0 | count, row[i]])
        else:
            out.append(row[i])
        i = j
    return bytes(out)


def encode_pcx(
    width: int, height: int, pixels, kind: str = "gray", palette=None
) -> bytes:
    """Fixture writer.  ``kind``: ``"gray"`` (pixels = bytes, written
    with an identity VGA palette), ``"rgb"`` (pixels = top-down RGB24,
    written as 3 planes), or ``"mono"`` (pixels = 0/1 ints)."""
    if kind == "gray":
        bpp, planes, bpl = 8, 1, width + (width & 1)
        if len(pixels) != width * height:
            raise PcxError("pixel buffer size mismatch")
    elif kind == "rgb":
        bpp, planes, bpl = 8, 3, width + (width & 1)
        if len(pixels) != width * height * 3:
            raise PcxError("pixel buffer size mismatch")
    elif kind == "mono":
        bpp, planes = 1, 1
        stride = (width + 7) // 8
        bpl = stride + (stride & 1)
        if len(pixels) != width * height:
            raise PcxError("pixel buffer size mismatch")
    else:
        raise PcxError(f"unknown kind {kind!r}")
    header = bytearray(128)
    header[0] = 0x0A
    header[1] = 5  # version 3.0
    header[2] = 1  # RLE
    header[3] = bpp
    struct.pack_into("<4H", header, 4, 0, 0, width - 1, height - 1)
    struct.pack_into("<HH", header, 12, 72, 72)  # DPI
    header[65] = planes
    struct.pack_into("<H", header, 66, bpl)
    struct.pack_into("<H", header, 68, 1)  # color/BW palette info

    body = bytearray()
    if kind == "mono":
        stride = (width + 7) // 8
        for r in range(height):
            row = bytearray(bpl)
            for x in range(width):
                if pixels[r * width + x]:
                    row[x >> 3] |= 0x80 >> (x & 7)
            body += _rle_encode(bytes(row))
    elif kind == "rgb":
        for r in range(height):
            line = bytearray(3 * bpl)
            for x in range(width):
                o = (r * width + x) * 3
                line[x] = pixels[o]
                line[bpl + x] = pixels[o + 1]
                line[2 * bpl + x] = pixels[o + 2]
            body += _rle_encode(bytes(line))
    else:
        for r in range(height):
            row = bytearray(bpl)
            row[:width] = pixels[r * width : (r + 1) * width]
            body += _rle_encode(bytes(row))
    out = bytes(header) + bytes(body)
    if kind == "gray":
        pal = palette or [(i, i, i) for i in range(256)]
        out += b"\x0c" + b"".join(bytes(c) for c in pal)
    return out
