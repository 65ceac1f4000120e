"""Pure-stdlib Truevision TGA decoder (round 13).

TGA is the graphics-tooling interchange format (game assets, render
dumps): an 18-byte header (id length, color-map type, image type,
color-map spec, x/y origin, width, height, bpp, descriptor), an
optional image id + color map, then pixel data — raw or RLE packets.

Supported: types 1/9 (color-mapped, 8-bit indices into a 15/16/24/
32-bit map), 2/10 (truecolor 15/16/24/32 bpp BGR(A), the 16-bit form
is ARGB1555 — 5-bit channels bit-replicate to 8 exactly like the BMP
kernel), 3/11 (8-bit grayscale); both row orders via descriptor bit 5
(top-to-bottom when set — TGA defaults to BOTTOM-up, the opposite of
most formats); RLE packets (high bit = run of the next pixel,
else literal count) which may NOT span rows' worth of accounting but
may span rows in practice — this decoder fills pixel-count-wise, as
real writers emit.  Alpha/attribute bits are ignored for luma (the
shared convention).  Rejected loudly: color-map types > 1, 32-bit
color-map entries with weird widths, Huffman/Delta types (32/33).

``decode_tga`` -> ``(width, height, luma_plane)`` top-down (the shared
image-kernel contract); ``encode_tga`` writes raw or RLE fixtures.
TGA has NO magic number — dispatchers must try it LAST or key on the
media-type column; ``looks_like_tga`` is a cheap structural sniff.
"""

from __future__ import annotations

import struct

__all__ = [
    "TgaError",
    "decode_tga",
    "tga_luma_stats",
    "encode_tga",
    "looks_like_tga",
]


class TgaError(ValueError):
    """Malformed or unsupported TGA payload."""


_EXPAND5 = bytes(((v << 3) | (v >> 2)) for v in range(32))


def looks_like_tga(data: bytes) -> bool:
    """Cheap structural sniff (TGA has no magic): plausible header
    fields, or the v2 footer signature."""
    if len(data) >= 26 and data[-18:-2] == b"TRUEVISION-XFILE":
        return True
    if len(data) < 18:
        return False
    cmap_type, img_type = data[1], data[2]
    bpp = data[16]
    width, height = struct.unpack("<HH", data[12:16])
    return (
        cmap_type in (0, 1)
        and img_type in (1, 2, 3, 9, 10, 11)
        and bpp in (8, 15, 16, 24, 32)
        and width > 0
        and height > 0
    )


def _px_luma(buf: bytes, off: int, bpp: int) -> int:
    """One pixel -> 8-bit luma.  TGA stores BGR(A) / ARGB1555 / gray."""
    if bpp == 8:
        return buf[off]
    if bpp in (15, 16):
        px = buf[off] | (buf[off + 1] << 8)
        r = _EXPAND5[(px >> 10) & 0x1F]
        g = _EXPAND5[(px >> 5) & 0x1F]
        b = _EXPAND5[px & 0x1F]
    else:  # 24/32: BGR(A)
        b, g, r = buf[off], buf[off + 1], buf[off + 2]
    return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16


def decode_tga(data: bytes) -> tuple[int, int, bytes]:
    """Decode -> ``(width, height, luma_plane)`` top-down row-major."""
    if len(data) < 18:
        raise TgaError("not a TGA: header too short")
    id_len, cmap_type, img_type = data[0], data[1], data[2]
    cmap_first, cmap_len, cmap_bpp = struct.unpack("<HHB", data[3:8])
    width, height = struct.unpack("<HH", data[12:16])
    bpp, desc = data[16], data[17]
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise TgaError(f"TGA image type {img_type} not supported")
    if cmap_type not in (0, 1):
        raise TgaError(f"TGA color-map type {cmap_type} not supported")
    if width == 0 or height == 0:
        raise TgaError("zero TGA dimension")
    mapped = img_type in (1, 9)
    rle = img_type in (9, 10, 11)
    if mapped:
        if cmap_type != 1 or cmap_len == 0:
            raise TgaError("color-mapped TGA without a color map")
        if bpp != 8:
            raise TgaError(f"{bpp}-bit color-map indices not supported")
        if cmap_bpp not in (15, 16, 24, 32):
            raise TgaError(f"{cmap_bpp}-bit color-map entries not supported")
    elif img_type in (3, 11):
        if bpp != 8:
            raise TgaError(f"{bpp}-bit grayscale TGA not supported")
    elif bpp not in (15, 16, 24, 32):
        raise TgaError(f"{bpp}-bit truecolor TGA not supported")

    pos = 18 + id_len
    lut = None
    if cmap_type == 1:
        entry_bytes = (cmap_bpp + 7) // 8
        table = data[pos : pos + entry_bytes * cmap_len]
        if len(table) < entry_bytes * cmap_len:
            raise TgaError("truncated TGA color map")
        pos += entry_bytes * cmap_len
        if mapped:
            lut = bytes(
                _px_luma(table, i * entry_bytes, cmap_bpp)
                for i in range(cmap_len)
            )

    px_bytes = (bpp + 7) // 8
    n = width * height
    if rle:
        raw = bytearray()
        p = pos
        while len(raw) < n * px_bytes:
            if p >= len(data):
                raise TgaError("TGA RLE stream exhausted")
            head = data[p]
            p += 1
            count = (head & 0x7F) + 1
            if head & 0x80:  # run packet: one pixel repeated
                px = data[p : p + px_bytes]
                if len(px) < px_bytes:
                    raise TgaError("truncated TGA RLE run")
                raw += px * count
                p += px_bytes
            else:  # literal packet
                need = count * px_bytes
                chunk = data[p : p + need]
                if len(chunk) < need:
                    raise TgaError("truncated TGA RLE literal")
                raw += chunk
                p += need
        del raw[n * px_bytes :]
    else:
        raw = data[pos : pos + n * px_bytes]
        if len(raw) < n * px_bytes:
            raise TgaError("TGA pixel data shorter than dimensions")

    top_down = bool(desc & 0x20)
    luma = bytearray(n)
    for i in range(n):
        if lut is not None:
            if raw[i] >= len(lut):
                raise TgaError("color index outside map")
            luma[i] = lut[raw[i]]
        else:
            luma[i] = _px_luma(raw, i * px_bytes, bpp)
    if not top_down:  # TGA default origin is bottom-left
        flipped = bytearray(n)
        for r in range(height):
            flipped[r * width : (r + 1) * width] = luma[
                (height - 1 - r) * width : (height - r) * width
            ]
        luma = flipped
    return width, height, bytes(luma)


def tga_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` kernel
    contract."""
    width, height, luma = decode_tga(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def _rle_pack(raw: bytes, px_bytes: int) -> bytes:
    out = bytearray()
    n = len(raw) // px_bytes
    i = 0
    while i < n:
        px = raw[i * px_bytes : (i + 1) * px_bytes]
        j = i + 1
        while (
            j < n
            and j - i < 128
            and raw[j * px_bytes : (j + 1) * px_bytes] == px
        ):
            j += 1
        if j - i >= 2:
            out += bytes([0x80 | (j - i - 1)]) + px
            i = j
        else:
            k = i + 1
            while (
                k < n
                and k - i < 128
                and not (
                    k + 1 < n
                    and raw[k * px_bytes : (k + 1) * px_bytes]
                    == raw[(k + 1) * px_bytes : (k + 2) * px_bytes]
                )
            ):
                k += 1
            out += bytes([k - i - 1]) + raw[i * px_bytes : k * px_bytes]
            i = k
    return bytes(out)


def encode_tga(
    width: int,
    height: int,
    pixels,
    kind: str = "gray",
    rle: bool = False,
    top_down: bool = True,
    palette=None,
) -> bytes:
    """Fixture writer.  ``kind``: ``"gray"`` (pixels = luma bytes),
    ``"bgr"`` (pixels = top-down RGB24, stored as BGR),
    ``"argb1555"`` (pixels = top-down RGB24, quantized to 5-bit), or
    ``"mapped"`` (pixels = indices, ``palette`` = [(r,g,b), ...])."""
    if kind == "gray":
        img_type, bpp = 3, 8
        raw = bytes(pixels)
        if len(raw) != width * height:
            raise TgaError("pixel buffer size mismatch")
    elif kind == "bgr":
        img_type, bpp = 2, 24
        if len(pixels) != width * height * 3:
            raise TgaError("pixel buffer size mismatch")
        raw = bytes(
            v
            for i in range(width * height)
            for v in (pixels[3 * i + 2], pixels[3 * i + 1], pixels[3 * i])
        )
    elif kind == "argb1555":
        img_type, bpp = 2, 16
        if len(pixels) != width * height * 3:
            raise TgaError("pixel buffer size mismatch")
        words = [
            ((pixels[3 * i] >> 3) << 10)
            | ((pixels[3 * i + 1] >> 3) << 5)
            | (pixels[3 * i + 2] >> 3)
            for i in range(width * height)
        ]
        raw = b"".join(struct.pack("<H", w) for w in words)
    elif kind == "mapped":
        if not palette or len(palette) > 256:
            raise TgaError("mapped TGA needs a 1..256 color palette")
        img_type, bpp = 1, 8
        raw = bytes(pixels)
        if len(raw) != width * height:
            raise TgaError("pixel buffer size mismatch")
        if max(raw) >= len(palette):
            raise TgaError("pixel index outside palette")
    else:
        raise TgaError(f"unknown kind {kind!r}")

    if not top_down:  # store bottom-up
        px_bytes = (bpp + 7) // 8
        rows = [
            raw[r * width * px_bytes : (r + 1) * width * px_bytes]
            for r in range(height)
        ]
        raw = b"".join(reversed(rows))
    body = _rle_pack(raw, (bpp + 7) // 8) if rle else raw
    if rle:
        img_type += 8
    cmap_type = 1 if kind == "mapped" else 0
    cmap_len = len(palette) if kind == "mapped" else 0
    header = (
        bytes([0, cmap_type, img_type])
        + struct.pack("<HHB", 0, cmap_len, 24 if cmap_type else 0)
        + struct.pack("<HHHH", 0, 0, width, height)
        + bytes([bpp, 0x20 if top_down else 0])
    )
    cmap = (
        b"".join(bytes([b, g, r]) for r, g, b in palette)
        if kind == "mapped"
        else b""
    )
    return header + cmap + body + b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
