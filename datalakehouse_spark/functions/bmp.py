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

Supported: BI_RGB at 1/4/8 (palettized) and 24/32 bits per pixel,
bottom-up or top-down (negative height), BITMAPINFOHEADER and the
larger V4/V5 headers (only the common leading fields are read),
standard-mask 32-bit BITFIELDS, BI_RLE8/BI_RLE4 run-length
compression (runs, absolute mode with word padding, end-of-line,
end-of-bitmap, and delta skips, which leave index 0 behind like most
renderers), and — round 13 — 16-bit RGB555 (BI_RGB's documented
16bpp default and the equivalent BITFIELDS masks) and RGB565
BITFIELDS.  16-bit channels expand to 8 bits by bit replication
((v << 3) | (v >> 2) for 5-bit, (v << 2) | (v >> 4) for 6-bit) —
exactly Pillow's BGR;15/BGR;16 unpackers — then feed the shared
ITU-R 601-2 integer luma.  Exotic profiles (other BITFIELDS masks,
PNG/JPEG-in-BMP) raise ``BmpError``.
"""

from __future__ import annotations

import struct

from datalakehouse_spark.functions.avi import _frame_rgb

__all__ = [
    "BmpError",
    "decode_bmp",
    "bmp_luma_stats",
    "encode_bmp",
    "encode_bmp16",
    "encode_bmp_palette",
    "encode_bmp_rle",
    "quantize_rgb555",
]


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


_MASKS_555 = (0x7C00, 0x03E0, 0x001F)
_MASKS_565 = (0xF800, 0x07E0, 0x001F)

# bit-replication expansion tables (Pillow's BGR;15 / BGR;16 unpackers)
_EXPAND5 = bytes(((v << 3) | (v >> 2)) for v in range(32))
_EXPAND6 = bytes(((v << 2) | (v >> 4)) for v in range(64))


def quantize_rgb555(rgb: bytes) -> bytes:
    """Project RGB24 onto the RGB555-representable lattice (quantize by
    truncation, expand by bit replication).  Idempotent; fixture
    writers use it so a 16-bit re-encoding carries byte-identical
    pixels to its 24-bit siblings."""
    return bytes(_EXPAND5[v >> 3] for v in rgb)


def _decode_rle(body: bytes, width: int, height: int, bpp: int) -> bytes:
    """BI_RLE8/BI_RLE4 -> top-down index plane.  RLE coordinates run
    bottom-up from (0,0); delta-skipped pixels keep index 0."""
    grid = bytearray(width * height)
    x = y = 0  # y from the BOTTOM row
    pos = 0

    def put(v: int) -> None:
        nonlocal x
        if x < width and y < height:
            grid[(height - 1 - y) * width + x] = v
        x += 1

    while pos + 2 <= len(body):
        cnt, val = body[pos], body[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if bpp == 8:
                for _ in range(cnt):
                    put(val)
            else:  # RLE4 runs alternate the two nibbles
                for k in range(cnt):
                    put((val >> 4) if k % 2 == 0 else (val & 0x0F))
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return bytes(grid)
        elif val == 2:  # delta skip
            if pos + 2 > len(body):
                raise BmpError("truncated RLE delta")
            x += body[pos]
            y += body[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels, word-aligned
            n = val
            if bpp == 8:
                if pos + n > len(body):
                    raise BmpError("truncated RLE absolute run")
                for k in range(n):
                    put(body[pos + k])
                pos += n + (n & 1)
            else:
                nbytes = (n + 1) // 2
                if pos + nbytes > len(body):
                    raise BmpError("truncated RLE absolute run")
                for k in range(n):
                    b = body[pos + k // 2]
                    put((b >> 4) if k % 2 == 0 else (b & 0x0F))
                pos += nbytes + (nbytes & 1)
    raise BmpError("RLE stream missing end-of-bitmap")


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
    masks = None
    if compression == 3 and bpp == 32:
        # BI_BITFIELDS with the STANDARD masks is byte-identical to
        # BI_RGB BGRX (the form V4/V5 writers emit — Python's own
        # python.bmp test image is one); anything else is a real
        # channel remap this kernel does not attempt
        masks_at = 14 + 40 if hdr_size > 40 else 14 + hdr_size
        masks = struct.unpack("<III", data[masks_at : masks_at + 12])
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise BmpError(f"non-standard BITFIELDS masks {masks}")
    elif compression == 3 and bpp == 16:
        # the only two 16-bit layouts in the wild: RGB555 (what BI_RGB
        # 16bpp means per the spec) and RGB565
        masks_at = 14 + 40 if hdr_size > 40 else 14 + hdr_size
        masks = struct.unpack("<III", data[masks_at : masks_at + 12])
        if masks not in (_MASKS_555, _MASKS_565):
            raise BmpError(f"non-standard 16-bit BITFIELDS masks {masks}")
    elif compression == 1 or compression == 2:
        if (compression == 1) != (bpp == 8) or (compression == 2) != (bpp == 4):
            raise BmpError(f"RLE{8 if compression == 1 else 4} needs matching bpp, got {bpp}")
        if height < 0:
            raise BmpError("top-down RLE BMP is invalid")
    elif compression != 0:
        raise BmpError(f"compressed BMP (type {compression}) not supported")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise BmpError(f"{bpp}-bit BMP not supported (need 1/4/8/16/24/32)")
    h = abs(height)
    if pixel_off < 14 + hdr_size or pixel_off > len(data):
        raise BmpError("bad pixel data offset")
    body = data[pixel_off:]

    if bpp == 16:
        # RGB555 (BI_RGB 16bpp default, or the matching BITFIELDS) and
        # RGB565: little-endian uint16 per pixel, rows padded to 4
        # bytes; channels bit-replicate to 8 bits (Pillow-identical)
        is565 = masks == _MASKS_565
        stride = ((width * 2) + 3) & ~3
        if len(body) < stride * h:
            raise BmpError("pixel data shorter than dimensions")
        top_down = height < 0
        luma = bytearray(width * h)
        for r in range(h):
            src = r if top_down else h - 1 - r
            row = body[src * stride : src * stride + 2 * width]
            for i in range(width):
                px = row[2 * i] | (row[2 * i + 1] << 8)
                if is565:
                    rc = _EXPAND5[(px >> 11) & 0x1F]
                    gc = _EXPAND6[(px >> 5) & 0x3F]
                else:
                    rc = _EXPAND5[(px >> 10) & 0x1F]
                    gc = _EXPAND5[(px >> 5) & 0x1F]
                bc = _EXPAND5[px & 0x1F]
                luma[r * width + i] = (
                    rc * 19595 + gc * 38470 + bc * 7471 + 0x8000
                ) >> 16
        return width, h, bytes(luma)

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

    # palettized (1/4/8-bit): color table (BGRX quads) follows the header
    (n_colors,) = struct.unpack("<I", data[46:50])
    n_colors = n_colors or (1 << bpp)
    pal_at = 14 + hdr_size
    pal = data[pal_at : pal_at + 4 * n_colors]
    if len(pal) < 4 * n_colors:
        raise BmpError("truncated color table")
    lut = bytes(
        (pal[4 * i + 2] * 19595 + pal[4 * i + 1] * 38470
         + pal[4 * i] * 7471 + 0x8000) >> 16
        for i in range(n_colors)
    )

    if compression in (1, 2):  # RLE: decode to a top-down index plane
        idx = _decode_rle(body, width, h, bpp)
        try:
            return width, h, bytes(lut[i] for i in idx)
        except IndexError as exc:
            raise BmpError("color index outside palette") from exc

    stride = ((width * bpp + 31) // 32) * 4  # rows pad to 4 bytes
    if len(body) < stride * h:
        raise BmpError("pixel data shorter than dimensions")
    top_down = height < 0
    per_byte = 8 // bpp
    mask = (1 << bpp) - 1
    luma = bytearray(width * h)
    for r in range(h):
        src = r if top_down else h - 1 - r
        row = body[src * stride : src * stride + stride]
        try:
            if bpp == 8:
                luma[r * width : (r + 1) * width] = bytes(
                    lut[i] for i in row[:width]
                )
            else:  # 1/4-bit: MSB-first packed indices
                luma[r * width : (r + 1) * width] = bytes(
                    lut[
                        (row[i // per_byte] >> (8 - bpp * (i % per_byte + 1)))
                        & mask
                    ]
                    for i in range(width)
                )
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


def encode_bmp16(
    width: int, height: int, rgb: bytes, fmt: int = 555,
    bitfields: bool = False,
) -> bytes:
    """16-bit bottom-up fixture writer (``rgb`` is top-down row-major
    RGB24, quantized by truncation).  ``fmt=555`` writes BI_RGB by
    default (the spec's 16bpp meaning) or explicit BITFIELDS masks
    with ``bitfields=True``; ``fmt=565`` always writes BITFIELDS (the
    only legal way to say 565)."""
    if len(rgb) != width * height * 3:
        raise BmpError(
            f"pixel buffer is {len(rgb)} bytes, need {width * height * 3}"
        )
    if fmt not in (555, 565):
        raise BmpError("fmt must be 555 or 565")
    use_masks = bitfields or fmt == 565
    stride = ((width * 2) + 3) & ~3
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = bytearray(stride)
        for x in range(width):
            o = (r * width + x) * 3
            if fmt == 565:
                px = ((rgb[o] >> 3) << 11) | ((rgb[o + 1] >> 2) << 5) | (rgb[o + 2] >> 3)
            else:
                px = ((rgb[o] >> 3) << 10) | ((rgb[o + 1] >> 3) << 5) | (rgb[o + 2] >> 3)
            row[2 * x] = px & 0xFF
            row[2 * x + 1] = px >> 8
        body += row
    masks = (
        struct.pack("<III", *(_MASKS_565 if fmt == 565 else _MASKS_555))
        if use_masks
        else b""
    )
    off = 54 + len(masks)
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 16, 3 if use_masks else 0,
        len(body), 2835, 2835, 0, 0,
    )
    return header + info + masks + bytes(body)


def _bmp_wrap(
    width: int, height: int, bpp: int, compression: int,
    palette, body: bytes,
) -> bytes:
    table = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    off = 54 + len(table)
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, compression, len(body),
        2835, 2835, len(palette), 0,
    )
    return header + info + table + body


def encode_bmp_palette(
    width: int, height: int, indices: bytes, palette, bpp: int = 8
) -> bytes:
    """Uncompressed palettized fixture (1/4/8-bit): ``indices`` is
    top-down row-major, one index per byte; rows pack MSB-first,
    written bottom-up with 4-byte padding."""
    if bpp not in (1, 4, 8):
        raise BmpError("palettized bpp must be 1/4/8")
    if len(indices) != width * height:
        raise BmpError("index buffer size mismatch")
    stride = ((width * bpp + 31) // 32) * 4
    per_byte = 8 // bpp
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = bytearray(stride)
        for i in range(width):
            v = indices[r * width + i] & ((1 << bpp) - 1)
            row[i // per_byte] |= v << (8 - bpp * (i % per_byte + 1))
        body += row
    return _bmp_wrap(width, height, bpp, 0, palette, bytes(body))


def encode_bmp_rle(
    width: int,
    height: int,
    indices: bytes,
    palette,
    bpp: int = 8,
    absolute_prefix: int = 0,
) -> bytes:
    """BI_RLE8/BI_RLE4 fixture writer: encoded runs per bottom-up row
    with end-of-line/end-of-bitmap markers; ``absolute_prefix`` > 0
    emits that many leading pixels of every row in ABSOLUTE mode
    (word-padded) so round trips exercise both modes.  Real renderers
    accept exactly this stream shape."""
    if bpp not in (4, 8):
        raise BmpError("RLE bpp must be 4 or 8")
    if len(indices) != width * height:
        raise BmpError("index buffer size mismatch")
    out = bytearray()
    for r in range(height - 1, -1, -1):
        row = indices[r * width : (r + 1) * width]
        i = 0
        if absolute_prefix >= 3 and width >= absolute_prefix:
            n = absolute_prefix
            out += bytes([0, n])
            if bpp == 8:
                out += row[:n]
                if n & 1:
                    out += b"\x00"
            else:
                packed = bytearray((n + 1) // 2)
                for k in range(n):
                    packed[k // 2] |= (row[k] & 0xF) << (4 if k % 2 == 0 else 0)
                out += packed
                if len(packed) & 1:
                    out += b"\x00"
            i = n
        while i < width:
            j = i
            while j < width and row[j] == row[i] and j - i < 255:
                j += 1
            if bpp == 8:
                out += bytes([j - i, row[i]])
            else:
                v = row[i] & 0xF
                out += bytes([j - i, (v << 4) | v])
            i = j
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return _bmp_wrap(width, height, bpp, 1 if bpp == 8 else 2, palette, bytes(out))
