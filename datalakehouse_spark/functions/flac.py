"""Pure-stdlib FLAC codec: STREAMINFO metadata (round 12) + full PCM
synthesis (round 13).

The round-12 verdict called FLAC PCM "stdlib-feasible, unlike
Layer-III/Vorbis", and it is: FLAC's audio path is pure integer math
with no external tables — frame headers (UTF-8 coded ordinals, block
size / rate / bps codes, CRC-8), subframes (CONSTANT, VERBATIM,
FIXED 0-4, LPC 1-32 with quantized coefficients), partitioned Rice
residuals (4- and 5-bit parameter methods, escape partitions), wasted
bits, stereo decorrelation (left/side, right/side, mid/side), and the
frame CRC-16.  ``flac_decode_pcm`` decodes every frame and verifies
the STREAMINFO MD5 against the reconstructed PCM — the format's own
end-to-end integrity check, which makes the decode self-proving.

The metadata contract (``flac_audio_stats``) still reads only the
mandatory STREAMINFO block:

    fLaC magic, then blocks of [last<<7 | type : 1][length: 3 BE];
    STREAMINFO (type 0, 34 bytes) packs, after the block/frame size
    bounds, a 64-bit bitfield: sample rate (20 bits), channels-1
    (3 bits), bits-per-sample-1 (5 bits), total samples (36 bits).

Writers: ``encode_flac`` emits REAL compressed streams (fixed or LPC
predictors, Rice residuals, all stereo decorrelations, optional
partitioned/escape/wasted-bit shapes) for round-trip fixtures;
``encode_flac_stub`` remains the header-only metadata fixture.

Malformed payloads raise ``FlacError`` so the corrupt->zero-row
degradation path fires.

Scale note: called per payload inside Arrow-batched ``mapInPandas``;
decode cost is linear in samples (one pass, no seeking).
"""

from __future__ import annotations

import struct

__all__ = [
    "FlacError",
    "flac_audio_stats",
    "encode_flac_stub",
    "flac_decode_pcm",
    "flac_pcm_stats",
    "encode_flac",
]


class FlacError(ValueError):
    """Malformed FLAC payload."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise FlacError(msg)


def flac_audio_stats(payload: bytes) -> tuple[int, int, int, float]:
    """``(sample_rate, n_channels, n_samples, duration_ms)`` from the
    STREAMINFO block.  A declared total of 0 means 'unknown' per spec
    and reports duration 0."""
    _expect(payload[:4] == b"fLaC", "not a FLAC stream")
    pos = 4
    while True:
        _expect(pos + 4 <= len(payload), "truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        _expect(len(body) == length, "truncated metadata block")
        if btype == 0:
            _expect(length >= 34, "STREAMINFO too short")
            # 8 bytes at offset 10: rate(20) | channels-1(3) | bps-1(5)
            # | total_samples(36)
            (packed,) = struct.unpack(">Q", body[10:18])
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            total = packed & ((1 << 36) - 1)
            _expect(rate > 0, "STREAMINFO declares zero sample rate")
            return rate, channels, total, total * 1000.0 / rate
        if last:
            break
        pos += 4 + length
    raise FlacError("no STREAMINFO block")


def encode_flac_stub(
    n_samples: int,
    sample_rate: int = 16000,
    channels: int = 1,
    bits_per_sample: int = 16,
) -> bytes:
    """fLaC + a single (last) STREAMINFO block declaring the stats; no
    audio frames (the metadata contract under test never reads them)."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (n_samples & ((1 << 36) - 1))
    )
    body = (
        struct.pack(">HH", 4096, 4096)  # min/max block size
        + b"\x00" * 6  # min/max frame size (unknown)
        + struct.pack(">Q", packed)
        + b"\x00" * 16  # md5 of unencoded audio (unset)
    )
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
# --------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x107; frame CRC-16 poly 0x18005)
# --------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# --------------------------------------------------------------------------
# MSB-first bit reader
# --------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within data[pos]

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.pos >= len(self.data):
                raise FlacError("bitstream exhausted")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


# --------------------------------------------------------------------------
# frame decode
# --------------------------------------------------------------------------

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}

_RATES = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
          6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}

_BPS = {0: None, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_ordinal(br: _Bits) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x80
    while first & mask:
        n += 1
        mask >>= 1
    _expect(2 <= n <= 7, "bad UTF-8 ordinal in frame header")
    val = first & (0x7F >> n)
    for _ in range(n - 1):
        b = br.read(8)
        _expect(b & 0xC0 == 0x80, "bad UTF-8 continuation in frame header")
        val = (val << 6) | (b & 0x3F)
    return val


def _decode_residual(br: _Bits, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    _expect(method in (0, 1), f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_parts = 1 << porder
    _expect(block_size % n_parts == 0, "partition count does not divide block")
    part_len = block_size >> porder
    _expect(part_len > order or porder == 0, "first partition underflow")
    out: list[int] = []
    for p in range(n_parts):
        n = (block_size - order) if porder == 0 else (part_len - (order if p == 0 else 0))
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(br.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: _Bits, block_size: int, bps: int) -> list[int]:
    _expect(br.read(1) == 0, "subframe padding bit set")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    _expect(eff > 0, "wasted bits exceed sample size")

    if sftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * block_size
    elif sftype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= sftype <= 12:  # FIXED
        order = sftype & 7
        _expect(order <= block_size, "fixed order exceeds block")
        samples = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        coef = _FIXED_COEF[order]
        for i, r in enumerate(res):
            pred = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coef))
            samples.append(r + pred)
    elif sftype >= 32:  # LPC
        order = (sftype & 31) + 1
        _expect(order <= block_size, "LPC order exceeds block")
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        _expect(prec != 15, "invalid LPC precision")
        prec += 1
        shift = br.read_signed(5)
        _expect(shift >= 0, "negative LPC shift")
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        for i, r in enumerate(res):
            pred = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coef)) >> shift
            samples.append(r + pred)
    else:
        raise FlacError(f"reserved subframe type {sftype}")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_frame(data: bytes, pos: int, si_bps: int):
    """Decode ONE frame starting at byte ``pos``; returns
    (channels_samples, next_pos, header_info)."""
    br = _Bits(data, pos)
    sync = br.read(14)
    _expect(sync == 0x3FFE, "lost frame sync")
    _expect(br.read(1) == 0, "reserved bit set")
    blocking = br.read(1)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    _expect(br.read(1) == 0, "reserved bit set")
    _read_utf8_ordinal(br)

    _expect(bs_code != 0, "reserved block size code")
    if bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    else:
        block_size = _BLOCK_SIZES[bs_code]

    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    else:
        _expect(sr_code != 15, "invalid sample rate code")

    _expect(bps_code in _BPS, f"reserved bps code {bps_code}")
    bps = _BPS[bps_code] or si_bps

    # CRC-8 covers the header bytes up to (not incl.) the crc byte
    _expect(br.bit == 0, "frame header not byte aligned")
    hdr_crc = br.read(8)
    _expect(_crc8(data[pos : br.pos - 1]) == hdr_crc, "frame header CRC-8 mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        chans = [
            _decode_subframe(br, block_size, bps) for _ in range(n_ch)
        ]
    else:
        _expect(ch_code <= 10, f"reserved channel assignment {ch_code}")
        # stereo decorrelation: the SIDE channel carries one extra bit
        if ch_code == 8:  # left/side
            left = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(br, block_size, bps + 1)
            right = _decode_subframe(br, block_size, bps)
            chans = [[s + r for s, r in zip(side, right)], right]
        else:  # mid/side
            mid = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            chans = [left, right]

    br.align()
    frame_crc = br.read(16)
    _expect(
        _crc16(data[pos : br.pos - 2]) == frame_crc, "frame CRC-16 mismatch"
    )
    return chans, br.pos, (block_size, bps, blocking)


def flac_decode_pcm(payload: bytes):
    """Decode ALL frames -> (rate, n_channels, bps, interleaved
    samples list, md5_ok) where md5_ok compares the STREAMINFO MD5
    against the decoded PCM (None when the writer left it zero)."""
    import hashlib

    _expect(payload[:4] == b"fLaC", "not a FLAC stream")
    pos = 4
    rate = channels = bps = total = None
    md5_declared = None
    while True:
        _expect(pos + 4 <= len(payload), "truncated metadata block header")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        _expect(len(body) == length, "truncated metadata block")
        if btype == 0:
            _expect(length >= 34, "STREAMINFO too short")
            (packed,) = struct.unpack(">Q", body[10:18])
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            md5_declared = body[18:34]
        pos += 4 + length
        if last:
            break
    _expect(rate, "no STREAMINFO")

    per_ch: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(payload):
        chans, pos, _info = decode_frame(payload, pos, bps)
        _expect(len(chans) == channels, "frame channel count mismatch")
        for c in range(channels):
            per_ch[c].extend(chans[c])

    n = len(per_ch[0])
    if total:
        _expect(n == total, f"decoded {n} samples, STREAMINFO declares {total}")
    interleaved = [per_ch[c][i] for i in range(n) for c in range(channels)]

    md5_ok = None
    if md5_declared and md5_declared != b"\x00" * 16:
        width = (bps + 7) // 8
        pcm = b"".join(
            int(s).to_bytes(width, "little", signed=True) for s in interleaved
        )
        md5_ok = hashlib.md5(pcm).digest() == md5_declared
    return rate, channels, bps, interleaved, md5_ok


# --------------------------------------------------------------------------
# encoder (fixtures): real rice-coded FIXED/CONSTANT/VERBATIM subframes
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_ordinal(n: int) -> bytes:
    """Extended-UTF-8 ordinal coding (frame/sample number)."""
    if n < 0x80:
        return bytes([n])
    for cont in range(1, 7):  # continuation byte count
        capacity = {1: 11, 2: 16, 3: 21, 4: 26, 5: 31, 6: 36}[cont]
        if n.bit_length() <= capacity:
            lead_prefix = (0xFF << (7 - cont)) & 0xFF
            lead = lead_prefix | (n >> (6 * cont))
            return bytes(
                [lead]
                + [0x80 | ((n >> (6 * (cont - 1 - i))) & 0x3F) for i in range(cont)]
            )
    raise FlacError("ordinal too large")


def _rice_param(residuals: list[int], cap: int) -> int:
    if not residuals:
        return 0
    mean = sum(abs(r) for r in residuals) / len(residuals)
    p = 0
    while (1 << p) < mean + 1 and p < cap:
        p += 1
    return p


def _write_residual(
    bw: _BitWriter,
    residuals: list[int],
    order: int,
    block_size: int,
    partition_order: int = 0,
    rice_method: int = 0,
    force_escape: bool = False,
) -> None:
    pbits = 4 if rice_method == 0 else 5
    escape = (1 << pbits) - 1
    bw.write(rice_method, 2)
    bw.write(partition_order, 4)
    n_parts = 1 << partition_order
    if partition_order:
        assert block_size % n_parts == 0
    part_len = block_size >> partition_order
    at = 0
    for p in range(n_parts):
        n = (block_size - order) if partition_order == 0 else (
            part_len - (order if p == 0 else 0)
        )
        part = residuals[at : at + n]
        at += n
        if force_escape:
            raw = max((abs(r).bit_length() + 1 for r in part), default=0)
            if not any(part):
                raw = 0
            bw.write(escape, pbits)
            bw.write(raw, 5)
            for r in part:
                if raw:
                    bw.write(r, raw)
            continue
        param = _rice_param(part, escape - 1)
        bw.write(param, pbits)
        for r in part:
            v = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
            bw.unary(v >> param)
            if param:
                bw.write(v & ((1 << param) - 1), param)


#: deterministic LPC coefficients for the fixture writer: a quantized
#: second-order predictor (~1.99, -0.99 at shift 10) — the residual is
#: computed with the decoder's exact integer math, so ANY coefficient
#: set round-trips; this one also compresses smooth signals.
_LPC_COEF, _LPC_SHIFT, _LPC_PREC = [2037, -1013], 10, 12


def _write_subframe(
    bw: _BitWriter,
    samples: list[int],
    bps: int,
    order: int | None = None,
    lpc: bool = False,
    partition_order: int = 0,
    rice_method: int = 0,
    force_escape: bool = False,
    use_wasted: bool = False,
) -> None:
    block_size = len(samples)
    if all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(samples[0], bps)
        return
    wasted = 0
    if use_wasted:
        tz = min(
            (abs(s) & -abs(s)).bit_length() - 1 for s in samples if s
        )
        wasted = min(tz, bps - 2) if tz > 0 else 0
        if wasted:
            samples = [s >> wasted for s in samples]
    eff = bps - wasted

    def _wasted_bits() -> None:
        if wasted:
            bw.write(1, 1)
            bw.write(0, wasted - 1) if wasted > 1 else None
            bw.write(1, 1)
        else:
            bw.write(0, 1)

    if lpc:
        order = len(_LPC_COEF)
        bw.write(0, 1)
        bw.write(32 | (order - 1), 6)  # LPC
        _wasted_bits()
        for s in samples[:order]:
            bw.write(s, eff)
        bw.write(_LPC_PREC - 1, 4)
        bw.write(_LPC_SHIFT, 5)
        for c in _LPC_COEF:
            bw.write(c, _LPC_PREC)
        residuals = [
            samples[i]
            - (
                sum(c * samples[i - 1 - j] for j, c in enumerate(_LPC_COEF))
                >> _LPC_SHIFT
            )
            for i in range(order, block_size)
        ]
    else:
        if order is None:
            order = min(2, block_size - 1)
        bw.write(0, 1)
        bw.write(8 | order, 6)  # FIXED
        _wasted_bits()
        for s in samples[:order]:
            bw.write(s, eff)
        coef = _FIXED_COEF[order]
        residuals = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            for i in range(order, block_size)
        ]
    _write_residual(
        bw, residuals, order, block_size, partition_order, rice_method, force_escape
    )


def encode_flac(
    samples,  # list of per-channel lists
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",  # independent|left_side|right_side|mid_side
    lpc: bool = False,
    partition_order: int = 0,
    rice_method: int = 0,
    force_escape: bool = False,
    use_wasted: bool = False,
) -> bytes:
    import hashlib

    channels = len(samples)
    n = len(samples[0])
    _expect(all(len(c) == n for c in samples), "channel length mismatch")
    _expect(channels in (1, 2) or stereo_mode == "independent", "decorrelation is stereo-only")

    width = (bps + 7) // 8
    pcm = b"".join(
        int(samples[c][i]).to_bytes(width, "little", signed=True)
        for i in range(n)
        for c in range(channels)
    )
    md5 = hashlib.md5(pcm).digest()

    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | (n & ((1 << 36) - 1))
    )
    si = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00" * 6
        + struct.pack(">Q", packed)
        + md5
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si

    frame_no = 0
    for start in range(0, n, block_size):
        blk = [c[start : start + block_size] for c in samples]
        bs = len(blk[0])
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocking
        # block size: use 16-bit-follows code (7) for generality
        hdr.write(7, 4)
        sr_code = {8000: 4, 16000: 5, 44100: 9, 48000: 10}.get(sample_rate, 13)
        hdr.write(sr_code, 4)
        if channels == 2 and stereo_mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        else:
            ch_code = channels - 1
        hdr.write(ch_code, 4)
        bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps]
        hdr.write(bps_code, 3)
        hdr.write(0, 1)
        for b in _utf8_ordinal(frame_no):
            hdr.write(b, 8)
        hdr.write(bs - 1, 16)
        if sr_code == 13:
            hdr.write(sample_rate, 16)
        hdr.align()
        head = hdr.bytes()
        head += bytes([_crc8(head)])

        # a short tail frame may not satisfy the partition constraints
        # (bs divisible by 2^p, first partition longer than the order)
        p_ord = partition_order
        while p_ord and (bs % (1 << p_ord) or (bs >> p_ord) <= 4):
            p_ord -= 1
        opts = dict(
            lpc=lpc,
            partition_order=p_ord,
            rice_method=rice_method,
            force_escape=force_escape,
            use_wasted=use_wasted,
        )
        bw = _BitWriter()
        if ch_code == 8:
            side = [l - r for l, r in zip(blk[0], blk[1])]
            _write_subframe(bw, blk[0], bps, **opts)
            _write_subframe(bw, side, bps + 1, **opts)
        elif ch_code == 9:
            side = [l - r for l, r in zip(blk[0], blk[1])]
            _write_subframe(bw, side, bps + 1, **opts)
            _write_subframe(bw, blk[1], bps, **opts)
        elif ch_code == 10:
            side = [l - r for l, r in zip(blk[0], blk[1])]
            mid = [(l + r) >> 1 for l, r in zip(blk[0], blk[1])]
            _write_subframe(bw, mid, bps, **opts)
            _write_subframe(bw, side, bps + 1, **opts)
        else:
            for c in range(channels):
                _write_subframe(bw, blk[c], bps, **opts)
        bw.align()
        frame = head + bw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)


def flac_pcm_stats(payload: bytes) -> tuple[int, int, int, int, int, bool | None]:
    """``(sample_rate, n_channels, bits_per_sample, n_samples_per_ch,
    weighted_checksum, md5_ok)`` — the operator-surface contract:
    ``weighted_checksum = sum((i+1) * s_i)`` over the interleaved
    samples pins both VALUES and ORDER with one SQL-mirrorable
    integer; ``md5_ok`` is the STREAMINFO MD5 verification."""
    rate, ch, bps, inter, md5_ok = flac_decode_pcm(payload)
    checksum = sum((i + 1) * s for i, s in enumerate(inter))
    return rate, ch, bps, len(inter) // ch, checksum, md5_ok
