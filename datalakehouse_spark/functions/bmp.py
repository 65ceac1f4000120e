"""Pure-stdlib BMP decoder — the fourth stdlib image kernel.

A BMP file is a 14-byte BITMAPFILEHEADER in front of exactly the DIB
the AVI kernel already parses (functions/avi.py normalizes BI_RGB
frames), so this module is thin: parse the file header and the
BITMAPINFOHEADER, honor the header-declared pixel-data offset, and
reuse the AVI row machinery for 24/32-bit BI_RGB; 8-bit palettized
DIBs (the other form found in the wild — Python's own test
``python.bmp`` is one) map indices through the BGRX color table.
Luma uses the same Pillow-identical ITU-R 601-2 integer formula as
the PNG/JPEG/GIF kernels.

Supported: BI_RGB at 8 (palettized), 24 and 32 bits per pixel,
bottom-up or top-down (negative height), BITMAPINFOHEADER and the
larger V4/V5 headers (only the common leading fields are read).
Compressed BMPs (RLE4/RLE8/BITFIELDS) and 1/4-bit depths raise
``BmpError`` — rare enough in data pipelines that the honest
degradation path beats a half-tested code path.
"""

from __future__ import annotations

import struct

from datalakehouse_spark.functions.avi import _frame_rgb

__all__ = ["BmpError", "decode_bmp", "bmp_luma_stats", "encode_bmp"]


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Decode -> ``(width, height, luma_plane)`` (row-major, top-down
    — the shared image-kernel contract)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise BmpError("not a BMP: bad signature or too short")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if width <= 0 or height == 0:
        raise BmpError("bad BMP dimensions")
    if compression == 3 and bpp == 32:
        # BI_BITFIELDS with the STANDARD masks is byte-identical to
        # BI_RGB BGRX (the form V4/V5 writers emit — Python's own
        # python.bmp test image is one); anything else is a real
        # channel remap this kernel does not attempt
        masks_at = 14 + 40 if hdr_size > 40 else 14 + hdr_size
        masks = struct.unpack("<III", data[masks_at : masks_at + 12])
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise BmpError(f"non-standard BITFIELDS masks {masks}")
    elif compression != 0:
        raise BmpError(f"compressed BMP (type {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise BmpError(f"{bpp}-bit BMP not supported (need 8/24/32)")
    h = abs(height)
    if pixel_off < 14 + hdr_size or pixel_off > len(data):
        raise BmpError("bad pixel data offset")
    body = data[pixel_off:]

    if bpp in (24, 32):
        try:
            rgb = _frame_rgb(body, width, height, bpp)
        except ValueError as exc:
            raise BmpError(str(exc)) from exc
        luma = bytearray(width * h)
        for i in range(width * h):
            o = 3 * i
            luma[i] = (
                rgb[o] * 19595 + rgb[o + 1] * 38470 + rgb[o + 2] * 7471
                + 0x8000
            ) >> 16
        return width, h, bytes(luma)

    # 8-bit palettized: color table (BGRX quads) follows the header
    (n_colors,) = struct.unpack("<I", data[46:50])
    n_colors = n_colors or 256
    pal_at = 14 + hdr_size
    pal = data[pal_at : pal_at + 4 * n_colors]
    if len(pal) < 4 * n_colors:
        raise BmpError("truncated color table")
    lut = bytes(
        (pal[4 * i + 2] * 19595 + pal[4 * i + 1] * 38470
         + pal[4 * i] * 7471 + 0x8000) >> 16
        for i in range(n_colors)
    )
    stride = (width + 3) & ~3
    if len(body) < stride * h:
        raise BmpError("pixel data shorter than dimensions")
    top_down = height < 0
    luma = bytearray(width * h)
    for r in range(h):
        src = r if top_down else h - 1 - r
        row = body[src * stride : src * stride + width]
        try:
            luma[r * width : (r + 1) * width] = bytes(lut[i] for i in row)
        except IndexError as exc:
            raise BmpError("color index outside palette") from exc
    return width, h, bytes(luma)


def bmp_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` kernel
    contract."""
    width, height, luma = decode_bmp(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bit bottom-up BI_RGB writer for fixtures (``rgb`` is
    top-down row-major RGB24)."""
    if len(rgb) != width * height * 3:
        raise BmpError(
            f"pixel buffer is {len(rgb)} bytes, need {width * height * 3}"
        )
    stride = ((width * 3) + 3) & ~3
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            o = (r * width + x) * 3
            row += bytes([rgb[o + 2], rgb[o + 1], rgb[o]])  # BGR
        row += b"\x00" * (stride - len(row))
        body += row
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835,
        0, 0,
    )
    return header + info + bytes(body)
