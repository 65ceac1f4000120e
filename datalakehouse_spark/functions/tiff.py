"""Pure-stdlib baseline TIFF decoder — round 12.

TIFF without compression is the simplest real raster format a corpus
carries (scanners, ML dataset dumps, satellite chips): a byte-order
header, a chain of IFDs (tag directories), and raw strips of samples.
That whole profile — TIFF 6.0 "baseline bilevel/grayscale/RGB" with
Compression=1 — decodes with ``struct`` alone, so it joins
PNG/JPEG/GIF/BMP on the REAL side of the image-decode kernel
(operators/multimodal.py ``decode_image``); compressed TIFFs (LZW,
PackBits, JPEG-in-TIFF, deflate) raise ``TiffUnsupported`` so the
honest probe contract routes them to a Pillow deployment.

Supported: both byte orders (``II``/``MM``), 8-bit grayscale
(PhotometricInterpretation 1 BlackIsZero and 0 WhiteIsZero — inverted
on read), 8-bit RGB/RGBA (extra samples beyond the first three are
ignored for luma), multi-strip layouts, inline or offset tag values.
Luma uses the house ITU-R 601-2 integer formula (identical constants
to functions/png.py, so a pixel-identical PNG and TIFF produce the
SAME mean luma).  Rejected loudly: any Compression != 1, bits per
sample != 8, tiled TIFFs, planar configuration 2.

``encode_tiff`` writes a single-strip baseline fixture (gray or RGB)
for round-trip tests and oracle slices.
"""

from __future__ import annotations

import struct

__all__ = [
    "TiffError",
    "TiffUnsupported",
    "decode_tiff",
    "tiff_luma_stats",
    "encode_tiff",
]


class TiffError(ValueError):
    """Malformed TIFF payload."""


class TiffUnsupported(TiffError):
    """Valid TIFF outside the baseline uncompressed profile."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise TiffError(msg)


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE, ASCII, SHORT, LONG


def _read_entries(data: bytes, bo: str) -> dict[int, list[int]]:
    """Parse the FIRST IFD into {tag: [values...]} (integer types
    only — rational/float tags are irrelevant to the pixel layout)."""
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    _expect(ifd_off + 2 <= len(data), "IFD offset out of range")
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    entries: dict[int, list[int]] = {}
    pos = ifd_off + 2
    _expect(pos + 12 * n <= len(data), "truncated IFD")
    for _ in range(n):
        tag, typ, count = struct.unpack(bo + "HHI", data[pos : pos + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:  # rational/float tag: not needed, skip
            pos += 12
            continue
        total = size * count
        if total <= 4:
            raw = data[pos + 8 : pos + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", data[pos + 8 : pos + 12])
            _expect(off + total <= len(data), f"tag {tag} value out of range")
            raw = data[off : off + total]
        if typ == 3:
            vals = list(struct.unpack(bo + f"{count}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{count}I", raw))
        else:  # BYTE/ASCII
            vals = list(raw)
        entries[tag] = vals
        pos += 12
    return entries


def decode_tiff(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline uncompressed TIFF -> ``(width, height,
    luma_plane)`` — the same contract as ``png.decode_png`` /
    ``jpeg.decode_jpeg`` (8-bit row-major luma)."""
    if len(data) < 8 or data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise TiffError("not a TIFF: bad byte-order header")
    bo = "<" if data[:2] == b"II" else ">"
    t = _read_entries(data, bo)

    def one(tag: int, default: int | None = None) -> int:
        if tag in t:
            return t[tag][0]
        _expect(default is not None, f"missing required tag {tag}")
        return default

    width, height = one(256), one(257)
    _expect(width > 0 and height > 0, "zero image dimension")
    compression = one(259, 1)
    if compression != 1:
        raise TiffUnsupported(
            f"TIFF compression {compression} needs Pillow; the stdlib "
            "kernel decodes baseline uncompressed (Compression=1) only"
        )
    if 322 in t or 323 in t:
        raise TiffUnsupported("tiled TIFF not supported (strips only)")
    if one(284, 1) != 1:
        raise TiffUnsupported("planar configuration 2 not supported")
    spp = one(277, 1)
    bits = t.get(258, [8])
    _expect(
        all(b == 8 for b in bits[:spp]),
        f"bits per sample {bits} not supported (need 8)",
    )
    photometric = one(262, 1)
    _expect(
        photometric in (0, 1, 2),
        f"photometric {photometric} not supported (gray/RGB only)",
    )
    _expect(
        (photometric == 2) == (spp >= 3),
        f"photometric {photometric} inconsistent with {spp} samples/px",
    )

    offsets = t.get(273)
    _expect(offsets is not None, "missing StripOffsets")
    counts = t.get(279)
    if counts is None:
        # spec allows omission for a single strip: rest of the row data
        _expect(len(offsets) == 1, "missing StripByteCounts")
        counts = [width * height * spp]
    _expect(len(offsets) == len(counts), "strip offset/count mismatch")
    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        _expect(off + cnt <= len(data), "strip out of range")
        raw += data[off : off + cnt]
    _expect(len(raw) >= width * height * spp, "pixel data shorter than dimensions")

    n = width * height
    if spp == 1:
        luma = bytes(raw[:n])
        if photometric == 0:  # WhiteIsZero: invert
            luma = bytes(255 - v for v in luma)
        return width, height, luma
    luma_plane = bytearray(n)
    for i in range(n):
        o = i * spp
        r, g, b = raw[o], raw[o + 1], raw[o + 2]
        luma_plane[i] = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
    return width, height, bytes(luma_plane)


def tiff_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` contract
    (mean of 8-bit luma / 255)."""
    width, height, luma = decode_tiff(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    color: bool = False,
    big_endian: bool = False,
) -> bytes:
    """Single-strip baseline TIFF: 8-bit grayscale (BlackIsZero) or
    8-bit RGB, either byte order — round-trip fixture for the decoder."""
    spp = 3 if color else 1
    _expect(len(pixels) == width * height * spp, "pixel buffer size mismatch")
    bo = ">" if big_endian else "<"

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # inline values are LEFT-justified in the 4-byte field (spec:
        # "the Value is left-justified"), so a big-endian SHORT must
        # occupy the first two bytes, not pack as a 4-byte int
        if typ == 3 and count == 1:
            val = struct.pack(bo + "H", value) + b"\x00\x00"
        else:
            val = struct.pack(bo + "I", value)
        return struct.pack(bo + "HHI", tag, typ, count) + val

    # layout: header(8) + IFD + [bits-per-sample triple] + pixel strip
    tags = []
    n_entries = 8  # same tag set for gray and color (258 count differs)
    ifd_len = 2 + 12 * n_entries + 4
    extra_off = 8 + ifd_len
    extra = b""
    if color:
        extra = struct.pack(bo + "3H", 8, 8, 8)
    strip_off = extra_off + len(extra)

    tags.append(entry(256, 4, 1, width))
    tags.append(entry(257, 4, 1, height))
    if color:
        tags.append(entry(258, 3, 3, extra_off))
    else:
        tags.append(entry(258, 3, 1, 8))
    tags.append(entry(259, 3, 1, 1))  # uncompressed
    tags.append(entry(262, 3, 1, 2 if color else 1))
    tags.append(entry(273, 4, 1, strip_off))
    tags.append(entry(277, 3, 1, spp))
    tags.append(entry(279, 4, 1, len(pixels)))

    ifd = struct.pack(bo + "H", n_entries) + b"".join(tags) + struct.pack(bo + "I", 0)
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    header = magic + struct.pack(bo + "I", 8)
    return header + ifd + extra + pixels
