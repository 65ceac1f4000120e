"""Pure-stdlib QOI ("Quite OK Image") decoder (round 13).

QOI (qoiformat.org — a public one-page spec) is the modern
lossless interchange format new image datasets increasingly ship: a
14-byte header (magic ``qoif``, big-endian width/height, channels,
colorspace) and a byte-stream of eight ops —

- ``QOI_OP_RGB`` (0xFE) / ``QOI_OP_RGBA`` (0xFF): literal pixels;
- ``QOI_OP_INDEX`` (00xxxxxx): one of 64 previously-seen pixels from
  the running hash table ((r*3 + g*5 + b*7 + a*11) % 64);
- ``QOI_OP_DIFF`` (01drdgdb): per-channel -2..1 deltas vs the
  previous pixel (bias 2, wrapping);
- ``QOI_OP_LUMA`` (10dggggg dr-dg|db-dg): green delta -32..31 with
  red/blue expressed relative to it (biases 32 and 8, wrapping);
- ``QOI_OP_RUN`` (11xxxxxx): repeat the previous pixel 1..62 times
  (biases 1; 63/64 are the RGB/RGBA tags).

The stream ends with seven 0x00 bytes then 0x01.  Alpha is ignored
for luma (the shared convention); RGB converts with the house
ITU-R 601-2 integer formula.  ``decode_qoi`` -> ``(width, height,
luma_plane)``; ``encode_qoi`` writes real compressed fixtures using
every op.  Malformed payloads raise ``QoiError``.
"""

from __future__ import annotations

import struct

__all__ = ["QoiError", "decode_qoi", "qoi_luma_stats", "encode_qoi"]


class QoiError(ValueError):
    """Malformed or unsupported QOI payload."""


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(data: bytes) -> tuple[int, int, bytes]:
    """Decode -> ``(width, height, luma_plane)`` (top-down row-major,
    the shared image-kernel contract)."""
    if len(data) < 22 or data[:4] != b"qoif":
        raise QoiError("not a QOI: bad magic or too short")
    width, height = struct.unpack(">II", data[4:12])
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise QoiError(f"bad QOI header (channels {channels}, cs {colorspace})")
    if width == 0 or height == 0 or width * height > 1 << 26:
        raise QoiError("bad QOI dimensions")
    n = width * height
    luma = bytearray(n)
    table = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    end = len(data) - 8  # the 8-byte end marker
    while i < n:
        if pos > end:
            raise QoiError("QOI stream exhausted before pixel count")
        op = data[pos]
        pos += 1
        if op == 0xFE:  # RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == 0xFF:  # RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:  # INDEX
                r, g, b, a = table[op & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((op >> 4) & 0x03) - 2) & 0xFF
                g = (g + ((op >> 2) & 0x03) - 2) & 0xFF
                b = (b + (op & 0x03) - 2) & 0xFF
            elif tag == 2:  # LUMA
                dg = (op & 0x3F) - 32
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (nxt & 0x0F) - 8) & 0xFF
            else:  # RUN
                run = (op & 0x3F) + 1
                v = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
                if i + run > n:
                    raise QoiError("QOI run past the pixel count")
                luma[i : i + run] = bytes([v]) * run
                i += run
                continue
        table[_hash(r, g, b, a)] = (r, g, b, a)
        luma[i] = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
        i += 1
    # The ops must stop exactly at the end marker: a stream truncated
    # mid-pixel would otherwise consume marker bytes as ops (0x00 =
    # INDEX 0) and return silently corrupted luma.
    if pos != end:
        raise QoiError("QOI ops did not end at the end marker")
    if data[end : end + 8] != b"\x00" * 7 + b"\x01":
        raise QoiError("missing QOI end marker")
    return width, height, bytes(luma)


def qoi_luma_stats(data: bytes) -> tuple[int, int, float]:
    """``(width, height, mean_luma)`` — the ``decode_image`` kernel
    contract."""
    width, height, luma = decode_qoi(data)
    n = max(width * height, 1)
    return width, height, sum(luma) / (255.0 * n)


def encode_qoi(width: int, height: int, rgb: bytes) -> bytes:
    """Real QOI encoder for fixtures (``rgb`` is top-down row-major
    RGB24): emits RUN / INDEX / DIFF / LUMA ops when they apply, RGB
    literals otherwise — the same greedy order the reference encoder
    uses, so streams exercise every op the decoder handles."""
    if len(rgb) != width * height * 3:
        raise QoiError(
            f"pixel buffer is {len(rgb)} bytes, need {width * height * 3}"
        )
    out = bytearray(
        b"qoif" + struct.pack(">II", width, height) + bytes([3, 0])
    )
    table = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        h = _hash(r, g, b, 255)
        if table[h] == (r, g, b, 255):
            out.append(h)
        else:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([0xFE, r, g, b])
        table[h] = (r, g, b, 255)
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)
