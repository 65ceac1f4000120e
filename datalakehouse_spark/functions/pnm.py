"""Pure-stdlib Netpbm (PNM) decoder — P1..P6 (round 13).

The Netpbm family is the plainest raster container in circulation
(scientific pipelines, OpenCV dumps, test suites): a magic (P1..P6),
ASCII header tokens (width, height, maxval for gray/color) separated
by whitespace with ``#`` comments, then samples — ASCII decimals for
P1/P2/P3, packed binary for P4/P5/P6.

- **P1/P4** (PBM bitmap): 1 = black per the spec, so luma inverts
  (1 -> 0, 0 -> 255).  P4 packs rows MSB-first with byte-aligned rows.
- **P2/P5** (PGM gray) and **P3/P6** (PPM color): maxval up to 65535;
  16-bit samples are big-endian per the spec and reduce to 8 bits by
  taking the high byte (the PNG/TIFF convention); other maxvals scale
  by round(v * 255 / maxval).  Color converts with the house
  ITU-R 601-2 integer luma, so a pixel-identical PPM and PNG agree.

``decode_pnm`` -> ``(width, height, luma_plane)`` (the shared
image-kernel contract); ``encode_pnm`` writes fixtures for any of the
six magics.  Malformed payloads raise ``PnmError``.
"""

from __future__ import annotations

__all__ = ["PnmError", "decode_pnm", "pnm_luma_stats", "encode_pnm"]


class PnmError(ValueError):
    """Malformed or unsupported PNM payload."""


def _tokens(data: bytes, pos: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` ASCII integer header tokens from ``pos``, skipping
    whitespace and ``#`` comments; return (values, next position)."""
    out: list[int] = []
    while len(out) < n:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos] == 0x23:  # '#' comment to EOL
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(data) and data[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise PnmError("bad PNM header token")
        out.append(int(data[start:pos]))
    return out, pos


def _ascii_samples(data: bytes, pos: int, n: int) -> list[int]:
    vals, _ = _tokens(data, pos, n)
    return vals


def decode_pnm(data: bytes) -> tuple[int, int, bytes]:
    """Decode P1..P6 -> ``(width, height, luma_plane)``."""
    if len(data) < 2 or data[0] != 0x50 or not 0x31 <= data[1] <= 0x36:
        raise PnmError("not a PNM: bad magic")
    kind = data[1] - 0x30
    bitmap = kind in (1, 4)
    color = kind in (3, 6)
    (dims, pos) = _tokens(data, 2, 2)
    width, height = dims
    if width <= 0 or height <= 0:
        raise PnmError("bad PNM dimensions")
    maxval = 1
    if not bitmap:
        (mv, pos) = _tokens(data, pos, 1)
        maxval = mv[0]
        if not 1 <= maxval <= 65535:
            raise PnmError(f"bad maxval {maxval}")
    spp = 3 if color else 1
    n_samples = width * height * spp

    if kind in (1, 2, 3):  # ASCII
        if kind == 1:
            # P1 digits may abut (no separators required)
            vals: list[int] = []
            p = pos
            while len(vals) < n_samples and p < len(data):
                c = data[p]
                if c in (0x30, 0x31):
                    vals.append(c - 0x30)
                elif c == 0x23:  # comment
                    while p < len(data) and data[p] not in (0x0A, 0x0D):
                        p += 1
                elif not data[p : p + 1].isspace():
                    raise PnmError("bad P1 sample byte")
                p += 1
            if len(vals) < n_samples:
                raise PnmError("P1 data shorter than dimensions")
        else:
            vals = _ascii_samples(data, pos, n_samples)
            if any(v > maxval for v in vals):
                raise PnmError("sample above maxval")
    else:  # binary: exactly ONE whitespace byte after the header
        pos += 1
        if kind == 4:
            stride = (width + 7) // 8
            need = stride * height
            body = data[pos : pos + need]
            if len(body) < need:
                raise PnmError("P4 data shorter than dimensions")
            vals = [
                (body[r * stride + (x >> 3)] >> (7 - (x & 7))) & 1
                for r in range(height)
                for x in range(width)
            ]
        elif maxval > 255:  # 16-bit big-endian samples
            need = 2 * n_samples
            body = data[pos : pos + need]
            if len(body) < need:
                raise PnmError("PNM data shorter than dimensions")
            vals = [
                (body[2 * i] << 8) | body[2 * i + 1] for i in range(n_samples)
            ]
            if any(v > maxval for v in vals):
                raise PnmError("sample above maxval")
        else:
            body = data[pos : pos + n_samples]
            if len(body) < n_samples:
                raise PnmError("PNM data shorter than dimensions")
            vals = list(body)
            if any(v > maxval for v in vals):
                raise PnmError("sample above maxval")

    if bitmap:  # 1 = BLACK per the spec
        return width, height, bytes(0 if v else 255 for v in vals)

    if maxval == 255:
        scale = list(range(256))
    elif maxval == 65535:
        scale = None  # high byte below
    else:
        scale = [(v * 255 + maxval // 2) // maxval for v in range(maxval + 1)]

    def s8(v: int) -> int:
        return v >> 8 if scale is None else scale[v]

    if not color:
        return width, height, bytes(s8(v) for v in vals)
    luma = bytearray(width * height)
    for i in range(width * height):
        r, g, b = s8(vals[3 * i]), s8(vals[3 * i + 1]), s8(vals[3 * i + 2])
        luma[i] = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
    return width, height, bytes(luma)


def pnm_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` kernel
    contract."""
    width, height, luma = decode_pnm(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def encode_pnm(
    width: int, height: int, samples, kind: int = 5, maxval: int = 255
) -> bytes:
    """Fixture writer for P1..P6.  ``samples`` is row-major ints —
    bits for P1/P4, gray for P2/P5, interleaved RGB for P3/P6."""
    if kind not in (1, 2, 3, 4, 5, 6):
        raise PnmError(f"kind must be 1..6, got {kind}")
    bitmap = kind in (1, 4)
    spp = 3 if kind in (3, 6) else 1
    if len(samples) != width * height * spp:
        raise PnmError("sample buffer size mismatch")
    limit = 1 if bitmap else maxval
    if any(not 0 <= v <= limit for v in samples):
        raise PnmError("sample out of range")
    head = f"P{kind}\n{width} {height}\n".encode()
    if not bitmap:
        head += f"{maxval}\n".encode()
    if kind in (1, 2, 3):
        body = " ".join(str(v) for v in samples).encode() + b"\n"
    elif kind == 4:
        stride = (width + 7) // 8
        rows = bytearray(stride * height)
        for r in range(height):
            for x in range(width):
                if samples[r * width + x]:
                    rows[r * stride + (x >> 3)] |= 0x80 >> (x & 7)
        body = bytes(rows)
    elif maxval > 255:
        body = b"".join(
            bytes([v >> 8, v & 0xFF]) for v in samples
        )
    else:
        body = bytes(samples)
    return head + body
