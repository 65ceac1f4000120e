"""Pure-stdlib GIF decoder — the third stdlib image kernel (after PNG
and JPEG) for Pillow-less containers.

GIF87a/89a is fully decodable with nothing beyond bit twiddling:
logical screen descriptor, global/local color tables, extension blocks
(graphic control with transparency, comment/plain-text/application),
image descriptors with optional interlacing, and variable-width LZW
with clear/end codes and dictionary growth to 4096 entries.  That is
what this module does — no dependencies, runs on any executor's bare
CPython.

``gif_luma_stats`` renders the FIRST frame composited onto a
screen-sized canvas (background color under transparency and outside
the frame rect) and reports ``(width, height, mean_luma)`` with the
same Pillow-identical ITU-R 601-2 integer luma the PNG/JPEG kernels
use; ``decode_gif`` additionally counts the remaining frames (animated
GIFs) by walking — not decompressing — their data blocks.

Malformed payloads raise ``GifError`` (the multimodal
corrupt->(0,0,NULL) degradation path).

A fixture writer (``encode_gif``) emits single-frame GIF87a with the
'uncompressed' LZW idiom (a CLEAR code before each literal keeps the
dictionary from growing, so the writer stays trivially correct);
dictionary-growth decoding is exercised against real libxslt-doc GIFs
in tests.
"""

from __future__ import annotations

import struct

__all__ = [
    "GifError",
    "decode_gif",
    "gif_luma_stats",
    "gif_iter_frames",
    "gif_video_stats",
    "encode_gif",
    "encode_gif_animation",
]


class GifError(ValueError):
    """Malformed or unsupported GIF payload."""


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; return
    (payload, position after the 0 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(out) < n:  # pragma: no cover - covered by length check
            raise GifError("truncated sub-block")
        pos += n


def _skip_sub_blocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """Variable-width LZW per the GIF spec; stops after ``n_pixels``
    indices (streams may omit the explicit end code)."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()

    # bit reader state (LSB-first within bytes)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    # dictionary: list of byte strings; indexes < clear are literals
    dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(dict_base)
    prev: bytes | None = None

    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream exhausted before pixel count")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise GifError("LZW stream ended short of the pixel count")
    del out[n_pixels:]
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[int, int, bytes, int]:
    """Decode -> ``(width, height, luma_plane, n_frames)``.

    The luma plane is the FIRST frame composited onto the logical
    screen (background color outside the frame rect and under
    transparent pixels); later frames are counted structurally."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF: bad signature")
    if len(data) < 13:
        raise GifError("truncated logical screen descriptor")
    width, height = struct.unpack("<HH", data[6:10])
    packed, bg_index, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        if len(gct[-1]) != 3:
            raise GifError("truncated global color table")
        pos += 3 * n
    if width == 0 or height == 0:
        raise GifError("zero logical screen dimension")

    transparent: int | None = None
    n_frames = 0
    canvas: bytearray | None = None

    while True:
        if pos >= len(data):
            raise GifError("missing GIF trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9 and n_frames == 0:  # graphic control
                body, pos = _sub_blocks(data, pos)
                if len(body) >= 4 and body[0] & 0x01:
                    transparent = body[3]
            else:
                pos = _skip_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block type {block:#x}")

        # image descriptor
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = [
                tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
            ]
            if len(palette[-1]) != 3:
                raise GifError("truncated local color table")
            pos += 3 * n
        if pos >= len(data):
            raise GifError("truncated image data")
        min_code = data[pos]
        pos += 1

        if n_frames == 0:
            if palette is None:
                raise GifError("first frame has no color table")
            stream, pos = _sub_blocks(data, pos)
            idx = _lzw_decode(min_code, stream, fw * fh)
            if ipacked & 0x40:  # interlaced: reorder rows
                rows = []
                for start, step in _INTERLACE_PASSES:
                    rows.extend(range(start, fh, step))
                ordered = bytearray(fw * fh)
                for src_row, dst_row in enumerate(rows):
                    ordered[dst_row * fw : (dst_row + 1) * fw] = idx[
                        src_row * fw : (src_row + 1) * fw
                    ]
                idx = ordered

            def _luma(color_index: int) -> int:
                try:
                    r, g, b = palette[color_index]
                except IndexError as exc:
                    raise GifError(
                        f"color index {color_index} outside palette"
                    ) from exc
                return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16

            bg = _luma(bg_index) if gct and bg_index < len(gct) else 0
            canvas = bytearray([bg]) * (width * height)
            lut = [_luma(i) for i in range(len(palette))]
            for y in range(min(fh, max(height - top, 0))):
                dst = (top + y) * width
                src = y * fw
                for x in range(min(fw, max(width - left, 0))):
                    ci = idx[src + x]
                    if ci != transparent:
                        canvas[dst + left + x] = (
                            lut[ci] if ci < len(lut) else _luma(ci)
                        )
        else:
            pos = _skip_sub_blocks(data, pos)
        n_frames += 1

    if canvas is None:
        raise GifError("GIF contains no image frame")
    return width, height, bytes(canvas), n_frames


def gif_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` kernel
    contract (first frame on the logical screen)."""
    width, height, luma, _n = decode_gif(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def gif_descriptor_offset(palette) -> int:
    """Byte offset of the image descriptor in an ``encode_gif`` output
    (header 13 bytes + global color table) — callers splicing frames
    for animation fixtures must NOT search for 0x2C, which legally
    occurs inside palettes."""
    bits = max(2, (len(palette) - 1).bit_length())
    return 13 + 3 * (1 << bits)


def encode_gif(width: int, height: int, indices: bytes, palette) -> bytes:
    """Minimal single-frame GIF87a writer for fixtures: global color
    table from ``palette`` ([(r,g,b), ...], power-of-two padded), pixel
    ``indices`` row-major, 'uncompressed' LZW (CLEAR before every
    literal — no dictionary growth, trivially correct)."""
    if len(indices) != width * height:
        raise GifError(
            f"index buffer is {len(indices)} bytes, need {width * height}"
        )
    if not palette or len(palette) > 256:
        raise GifError("palette must hold 1..256 colors")
    bits = max(2, (len(palette) - 1).bit_length())
    size = 1 << bits
    if max(indices) >= size:
        raise GifError("pixel index outside palette")
    gct = b"".join(
        bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
        for i in range(size)
    )
    head = (
        b"GIF87a"
        + struct.pack("<HH", width, height)
        + bytes([0x80 | (bits - 1), 0, 0])
        + gct
    )
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"

    clear = size
    end = size + 1
    cw = bits + 1
    acc = 0
    nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for px in indices:
        emit(clear)  # keeps the dictionary (and code width) fixed
        emit(px)
    emit(end)
    if nbits:
        stream.append(acc & 0xFF)

    blocks = bytearray()
    for s in range(0, len(stream), 255):
        chunk = stream[s : s + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return head + desc + bytes([bits]) + bytes(blocks) + b"\x3b"


# ---------------------------------------------------------------------------
# round 13: animated GIFs as a video surface — per-frame composited
# pixels (the disposal state machine) and structural duration stats
# ---------------------------------------------------------------------------


def _read_screen(data: bytes):
    """Header + logical screen + global color table -> (width, height,
    bg_index, gct, pos)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF: bad signature")
    if len(data) < 13:
        raise GifError("truncated logical screen descriptor")
    width, height = struct.unpack("<HH", data[6:10])
    packed, bg_index = data[10], data[11]
    if width == 0 or height == 0:
        raise GifError("zero logical screen dimension")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        if len(gct[-1]) != 3:
            raise GifError("truncated global color table")
        pos += 3 * n
    return width, height, bg_index, gct, pos


def gif_iter_frames(data: bytes, stride: int = 1):
    """Full animation decode: yield ``(frame_idx, rgb24)`` for every
    ``stride``-th frame, where ``rgb24`` is the logical screen AFTER
    compositing that frame — transparency keeps the underlying pixels,
    and the PREVIOUS frame's disposal (1 leave / 2 restore-background /
    3 restore-previous) is applied before each new frame, per the
    GIF89a state machine.  Top-down row-major RGB24, so a GIF frame
    and an AVI frame of the same pixels share one fingerprint
    (``sample_frames``' cross-container dedup key)."""
    if stride < 1:
        raise GifError(f"stride must be >= 1, got {stride}")
    width, height, bg_index, gct, pos = _read_screen(data)
    bg = (
        bytes(gct[bg_index])
        if gct is not None and bg_index < len(gct)
        else b"\x00\x00\x00"
    )
    canvas = bytearray(bg * (width * height))
    transparent: int | None = None
    disposal = 0
    pending: tuple[int, tuple[int, int, int, int]] | None = None  # (disposal, rect)
    saved: bytes | None = None
    frame_idx = 0

    while True:
        if pos >= len(data):
            raise GifError("missing GIF trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:
            return
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:
                body, pos = _sub_blocks(data, pos)
                if len(body) >= 4:
                    # frame timing (delay) is gif_video_stats' concern;
                    # the compositor only needs disposal + transparency
                    disposal = (body[0] >> 2) & 0x07
                    transparent = body[3] if body[0] & 0x01 else None
            else:
                pos = _skip_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block type {block:#x}")

        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = [
                tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
            ]
            if len(palette[-1]) != 3:
                raise GifError("truncated local color table")
            pos += 3 * n
        if palette is None:
            raise GifError("frame has no color table")
        if pos >= len(data):
            raise GifError("truncated image data")
        min_code = data[pos]
        pos += 1
        stream, pos = _sub_blocks(data, pos)

        # dispose of the PREVIOUS frame before drawing this one
        if pending is not None:
            pdisp, (pl, pt, pw, ph) = pending
            if pdisp == 2:
                for y in range(min(ph, max(height - pt, 0))):
                    row0 = ((pt + y) * width + pl) * 3
                    n_px = min(pw, max(width - pl, 0))
                    canvas[row0 : row0 + 3 * n_px] = bg * n_px
            elif pdisp == 3 and saved is not None:
                canvas[:] = saved
        saved = bytes(canvas) if disposal == 3 else None

        idx = _lzw_decode(min_code, stream, fw * fh)
        if ipacked & 0x40:  # interlaced rows
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, fh, step))
            ordered = bytearray(fw * fh)
            for src_row, dst_row in enumerate(rows):
                ordered[dst_row * fw : (dst_row + 1) * fw] = idx[
                    src_row * fw : (src_row + 1) * fw
                ]
            idx = ordered

        for y in range(min(fh, max(height - top, 0))):
            src = y * fw
            dst0 = ((top + y) * width + left) * 3
            for x in range(min(fw, max(width - left, 0))):
                ci = idx[src + x]
                if ci == transparent:
                    continue
                try:
                    r, g, b = palette[ci]
                except IndexError as exc:
                    raise GifError(
                        f"color index {ci} outside palette"
                    ) from exc
                o = dst0 + 3 * x
                canvas[o] = r
                canvas[o + 1] = g
                canvas[o + 2] = b

        if frame_idx % stride == 0:
            yield frame_idx, bytes(canvas)
        pending = (disposal, (left, top, fw, fh))
        transparent = None
        disposal = 0
        frame_idx += 1


def gif_video_stats(data: bytes) -> tuple[int, int, int, float, float]:
    """Structural animation stats WITHOUT pixel decode: ``(width,
    height, n_frames, fps, duration_ms)``.  Per-frame delays come from
    the graphic-control extensions (centiseconds; the de-facto-standard
    10 cs substitutes for 0/absent, as players do); fps is
    frames/duration."""
    width, height, _bg, _gct, pos = _read_screen(data)
    n_frames = 0
    total_cs = 0
    delay_cs = 0
    while True:
        if pos >= len(data):
            raise GifError("missing GIF trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:
                body, pos = _sub_blocks(data, pos)
                if len(body) >= 4:
                    (delay_cs,) = struct.unpack("<H", body[1:3])
            else:
                pos = _skip_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block type {block:#x}")
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        if pos >= len(data):
            raise GifError("truncated image data")
        pos += 1  # LZW min code size
        pos = _skip_sub_blocks(data, pos)
        n_frames += 1
        total_cs += delay_cs or 10
        delay_cs = 0
    if n_frames == 0:
        raise GifError("GIF contains no image frame")
    duration_ms = total_cs * 10.0
    fps = n_frames * 1000.0 / duration_ms if duration_ms else 0.0
    return width, height, n_frames, fps, duration_ms


def _lzw_uncompressed(indices: bytes, bits: int) -> bytes:
    """The 'uncompressed' LZW idiom (CLEAR before every literal) as
    data sub-blocks, shared by both fixture writers."""
    size = 1 << bits
    clear = size
    end = size + 1
    cw = bits + 1
    acc = 0
    nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for px in indices:
        emit(clear)
        emit(px)
    emit(end)
    if nbits:
        stream.append(acc & 0xFF)
    blocks = bytearray()
    for s in range(0, len(stream), 255):
        chunk = stream[s : s + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return bytes(blocks)


def encode_gif_animation(
    width: int,
    height: int,
    frames,
    palette,
    bg_index: int = 0,
) -> bytes:
    """GIF89a animation fixture writer.  ``frames`` is a list of dicts:
    ``{"indices": bytes, "left": int, "top": int, "width": int,
    "height": int, "disposal": 0|1|2|3, "transparent": int|None,
    "delay_cs": int}`` (rect fields default to the full screen;
    control fields default to 0/None/4)."""
    if not palette or len(palette) > 256:
        raise GifError("palette must hold 1..256 colors")
    if not frames:
        raise GifError("animation needs at least one frame")
    bits = max(2, (len(palette) - 1).bit_length())
    size = 1 << bits
    if not 0 <= bg_index < size:
        raise GifError("background index outside color table")
    gct = b"".join(
        bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
        for i in range(size)
    )
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0x80 | (bits - 1), bg_index, 0])
        + gct
    )
    for f in frames:
        left = f.get("left", 0)
        top = f.get("top", 0)
        fw = f.get("width", width)
        fh = f.get("height", height)
        indices = f["indices"]
        if len(indices) != fw * fh:
            raise GifError(
                f"frame index buffer is {len(indices)} bytes, need {fw * fh}"
            )
        if max(indices) >= size:
            raise GifError("pixel index outside palette")
        disposal = f.get("disposal", 0)
        transparent = f.get("transparent")
        delay_cs = f.get("delay_cs", 4)
        packed = ((disposal & 0x07) << 2) | (1 if transparent is not None else 0)
        out += (
            b"\x21\xf9\x04"
            + bytes([packed])
            + struct.pack("<H", delay_cs)
            + bytes([transparent if transparent is not None else 0, 0])
        )
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + b"\x00"
        out += bytes([bits]) + _lzw_uncompressed(indices, bits)
    out += b"\x3b"
    return bytes(out)
