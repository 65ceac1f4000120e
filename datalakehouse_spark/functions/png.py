"""Pure-stdlib PNG codec — the real image-decode kernel for containers
without Pillow.

The multimodal operators (operators/multimodal.py) need a REAL decode
path, but this build container ships no image library.  PNG is fully
decodable with nothing beyond ``zlib`` + ``struct``: parse the chunk
stream, inflate IDAT, reverse the five scanline filters, and expand the
color type.  That is what this module does — no dependencies, runs on
any executor's bare CPython.

Supported: 8-bit greyscale (color type 0), truecolor (2), palette (3),
grey+alpha (4), RGBA (6); 16-bit samples are accepted and truncated to
their high byte (what Pillow's ``convert("L")`` path effectively does);
Adam7 interlacing (round 12 — each of the seven passes is an
independently-filtered subimage whose pixels scatter back on the
pass grid); and sub-byte depths 1/2/4 for grey and palette images
(round 12 — scanned documents and icon palettes; samples unpack
MSB-first, grey scales by 255/(2^d - 1) exactly as Pillow does,
the filter unit for packed rows is one byte per the spec).

Luma uses Pillow's exact ITU-R 601-2 integer formula
``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` so a mixed fleet where
some workers have Pillow and some fall back to this module produces
bit-identical features.

A minimal encoder (`encode_png`, filter 0, 8-bit grey/RGB/RGBA) is
included for fixture generation and round-trip tests.

Scale note: this kernel is called per payload inside Arrow-batched
``mapInPandas`` — pure CPU, no GIL-released C loop, so it is ~10-50x
slower than Pillow per image.  It exists for correctness and
portability; deployments that decode billions of images install Pillow
(the operators prefer it automatically).
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def _chunks(data: bytes):
    if not data.startswith(_SIGNATURE):
        raise PngError("not a PNG: bad signature")
    pos = len(_SIGNATURE)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int, stride: int) -> bytearray:
    """Reverse per-scanline filtering (types 0-4) -> raw sample bytes."""
    out = bytearray(height * stride)
    pos = 0
    prev_off = -stride
    for y in range(height):
        if pos >= len(raw):
            raise PngError("truncated image data")
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        if len(line) != stride:
            raise PngError("truncated scanline")
        pos += stride
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                b = out[prev_off + off + x] if y else 0
                out[off + x] = (line[x] + b) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + off + x] if y else 0
                out[off + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + off + x] if y else 0
                c = out[prev_off + off + x - bpp] if (y and x >= bpp) else 0
                out[off + x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
    return out


def _unpack_bits(row: bytes, width: int, depth: int) -> list[int]:
    """Unpack ``width`` MSB-first ``depth``-bit samples from a packed
    scanline (trailing pad bits ignored, per spec)."""
    mask = (1 << depth) - 1
    per_byte = 8 // depth
    return [
        (row[i // per_byte] >> (8 - depth * (i % per_byte + 1))) & mask
        for i in range(width)
    ]


def _decode_subbyte(
    raw: bytes, width: int, height: int, depth: int, interlace: int
) -> list[int]:
    """Sub-byte sample grid (1/2/4-bit): unfilter packed scanlines
    (filter unit = 1 byte), unpack, and — when interlaced — scatter
    each pass onto the Adam7 grid."""
    if not interlace:
        stride = (width * depth + 7) // 8
        packed = _unfilter(raw, width, height, 1, stride)
        out: list[int] = []
        for y in range(height):
            out.extend(
                _unpack_bits(packed[y * stride : (y + 1) * stride], width, depth)
            )
        return out
    out = [0] * (width * height)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        pstride = (pw * depth + 7) // 8
        need = (1 + pstride) * ph
        sub = _unfilter(raw[pos : pos + need], pw, ph, 1, pstride)
        pos += need
        for j in range(ph):
            vals = _unpack_bits(sub[j * pstride : (j + 1) * pstride], pw, depth)
            base = (y0 + j * dy) * width
            for i, v in enumerate(vals):
                out[base + x0 + i * dx] = v
    return out


#: Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _deinterlace_adam7(
    raw: bytes, width: int, height: int, bpp: int
) -> bytearray:
    """Reassemble an Adam7 stream: each non-empty pass is its own
    filtered subimage (filter state never crosses passes), scattered
    back onto the full-resolution grid."""
    out = bytearray(width * height * bpp)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes NO bytes (spec)
        pstride = pw * bpp
        need = (1 + pstride) * ph
        sub = _unfilter(raw[pos : pos + need], pw, ph, bpp, pstride)
        pos += need
        for j in range(ph):
            row_base = (y0 + j * dy) * width
            for i in range(pw):
                src = j * pstride + i * bpp
                dst = (row_base + x0 + i * dx) * bpp
                out[dst : dst + bpp] = sub[src : src + bpp]
    return out


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG payload -> ``(width, height, luma_plane)``.

    ``luma_plane`` is ``width*height`` bytes of 8-bit luma in row-major
    order (greyscale images pass through; color converts via the
    Pillow-identical ITU-R 601-2 integer formula).
    """
    width = height = None
    bit_depth = color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if interlace not in (0, 1):
                raise PngError(f"unknown interlace method {interlace}")
            if bit_depth not in (1, 2, 4, 8, 16):
                raise PngError(f"bit depth {bit_depth} not supported")
            if color_type not in _CHANNELS:
                raise PngError(f"color type {color_type} not supported")
            if bit_depth < 8 and color_type not in (0, 3):
                raise PngError(
                    f"sub-byte depth {bit_depth} is only valid for "
                    "grey/palette color types"
                )
            if color_type == 3 and bit_depth == 16:
                raise PngError("palette PNG cannot be 16-bit")
        elif ctype == b"PLTE":
            palette = [tuple(body[i : i + 3]) for i in range(0, len(body), 3)]
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("missing IHDR")
    if not idat:
        raise PngError("missing IDAT")
    raw = zlib.decompress(bytes(idat))
    if bit_depth < 8:
        samples = _decode_subbyte(raw, width, height, bit_depth, interlace)
        luma = bytearray(width * height)
        if color_type == 0:
            scale = 255 // ((1 << bit_depth) - 1)  # exact: 255, 85, 17
            for i, v in enumerate(samples):
                luma[i] = v * scale
        else:  # palette
            if palette is None:
                raise PngError("palette image missing PLTE")
            try:
                for i, v in enumerate(samples):
                    r, g, b = palette[v]
                    luma[i] = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
            except (IndexError, ValueError) as exc:
                raise PngError(f"invalid palette reference: {exc}") from exc
        return width, height, bytes(luma)
    nch = _CHANNELS[color_type]
    sample_bytes = bit_depth // 8
    bpp = nch * sample_bytes
    stride = width * bpp
    if interlace:
        px = _deinterlace_adam7(raw, width, height, bpp)
    else:
        px = _unfilter(raw, width, height, bpp, stride)

    luma = bytearray(width * height)
    step = bpp
    if color_type == 0:  # grey (16-bit: take high byte)
        for i in range(width * height):
            luma[i] = px[i * step]
    elif color_type == 4:  # grey + alpha
        for i in range(width * height):
            luma[i] = px[i * step]
    elif color_type == 3:  # palette -> RGB -> luma
        if palette is None:
            raise PngError("palette image missing PLTE")
        try:
            for i in range(width * height):
                r, g, b = palette[px[i]]
                luma[i] = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
        except (IndexError, ValueError) as exc:
            # out-of-range palette index / truncated PLTE entry: keep
            # the documented malformed-payload contract (PngError, not
            # a leaked IndexError) so decode_image's corrupt→(0,0,NULL)
            # degradation path fires
            raise PngError(f"invalid palette reference: {exc}") from exc
    else:  # 2 (RGB) or 6 (RGBA); 16-bit: high bytes at offsets 0/sb/2sb
        for i in range(width * height):
            o = i * step
            r, g, b = px[o], px[o + sample_bytes], px[o + 2 * sample_bytes]
            luma[i] = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
    return width, height, bytes(luma)


def png_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` with mean_luma normalized to
    [0, 1] — the ``decode_image`` kernel contract (sum of 8-bit luma /
    (255 * n), matching the Pillow histogram path bit-for-bit)."""
    width, height, luma = decode_png(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _pack_bits(samples, depth: int) -> bytes:
    """Pack ``depth``-bit samples MSB-first into bytes (zero pad)."""
    per_byte = 8 // depth
    out = bytearray((len(samples) + per_byte - 1) // per_byte)
    for i, v in enumerate(samples):
        out[i // per_byte] |= (v & ((1 << depth) - 1)) << (
            8 - depth * (i % per_byte + 1)
        )
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    interlace: bool = False,
    bit_depth: int = 8,
) -> bytes:
    """Minimal encoder (8-bit) for fixtures and round-trip tests.
    ``pixels`` is row-major samples: 1 byte/px for grey (0), 3 for RGB
    (2), 4 for RGBA (6).  Non-interlaced scanlines use filter 0;
    ``interlace=True`` writes Adam7 passes with filter 0 on each
    pass's first row and filter 2 (Up) on the rest — so round-trip
    tests prove the decoder keeps filter state PASS-LOCAL (an Up
    filter referencing the previous pass's row would corrupt)."""
    if color_type not in (0, 2, 6):
        raise PngError("encoder supports color types 0, 2, 6")
    if bit_depth != 8 and (color_type != 0 or bit_depth not in (1, 2, 4)):
        raise PngError("sub-byte encoding is grey-only (depths 1/2/4)")
    nch = _CHANNELS[color_type]
    if len(pixels) != width * height * nch:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * nch}"
        )
    ihdr = struct.pack(
        ">IIBBBBB",
        width, height, bit_depth, color_type, 0, 0, 1 if interlace else 0,
    )
    if bit_depth < 8:
        # pixels carry one sample per byte, values < 2^depth
        if not interlace:
            raw = b"".join(
                b"\x00"
                + _pack_bits(pixels[y * width : (y + 1) * width], bit_depth)
                for y in range(height)
            )
        else:
            parts = []
            for x0, y0, dx, dy in _ADAM7:
                pw = (width - x0 + dx - 1) // dx
                ph = (height - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                for j in range(ph):
                    row = [
                        pixels[(y0 + j * dy) * width + x0 + i * dx]
                        for i in range(pw)
                    ]
                    parts.append(b"\x00" + _pack_bits(row, bit_depth))
            raw = b"".join(parts)
        return (
            _SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 9))
            + _chunk(b"IEND", b"")
        )
    stride = width * nch
    if not interlace:
        raw = b"".join(
            b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
        )
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            prev = None
            for j in range(ph):
                row = bytearray()
                for i in range(pw):
                    o = ((y0 + j * dy) * width + x0 + i * dx) * nch
                    row += pixels[o : o + nch]
                if prev is None:
                    parts.append(b"\x00" + bytes(row))
                else:
                    parts.append(
                        b"\x02"
                        + bytes((row[x] - prev[x]) & 0xFF for x in range(len(row)))
                    )
                prev = row
        raw = b"".join(parts)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )
