"""Pure-stdlib MPEG audio (MP3) frame-header parser — the
audio-metadata kernel for the compression format real corpora carry.

The multimodal audio path (operators/multimodal.py ``decode_audio`` /
``extract_audio_features``) has been REAL for WAV/PCM since round 9;
MP3 previously raised the honest ``NotImplementedError``.  Full PCM
decode of an MP3 genuinely needs the Layer-III synthesis filterbank
(out of scope for a stdlib kernel — rms/peak stay NULL), but the
METADATA pass — ``(sample_rate, n_channels, n_frames, duration_ms)``
— needs nothing beyond the public MPEG-1/2/2.5 frame-header layout
(ISO/IEC 11172-3 / 13818-3):

- 11-bit sync (0xFFE) + version + layer + bitrate/samplerate indices +
  padding + channel mode per frame header;
- frame byte length = coeff * bitrate / samplerate (+ padding), with
  coeff 144 for Layer III @ MPEG-1, 72 @ MPEG-2/2.5 (Layer II: 144;
  Layer I: 12 slots of 4 bytes);
- samples per frame: L1 384; L2 1152; L3 1152 (MPEG-1) / 576 (MPEG-2/2.5).

The walker skips a leading ID3v2 tag (10-byte header, syncsafe size),
then requires a valid first frame header and follows frame lengths
(tolerating a trailing ID3v1/TAG block); free-format (bitrate index
0) and reserved indices raise ``Mp3Error``.  ``n_frames`` counts
MPEG frames; duration derives from per-frame sample counts over the
sample rate.  A Xing/Info VBR header, when present, is validated
against the walked frame count implicitly (the walk is authoritative).

A fixture writer (``encode_mp3_stub``) emits structurally valid
constant-bitrate Layer-III frames with zeroed payloads for round-trip
tests.

Malformed payloads raise ``Mp3Error`` so the multimodal degradation
path fires.
"""

from __future__ import annotations

__all__ = ["Mp3Error", "mp3_audio_stats", "encode_mp3_stub"]


class Mp3Error(ValueError):
    """Malformed MPEG audio payload."""


#: bitrate tables in kbit/s, indexed [version_group][layer][idx 1..14]
#: version_group: 0 = MPEG-1, 1 = MPEG-2/2.5
_BITRATES = {
    (0, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

#: sample rates in Hz, indexed [version_bits][idx 0..2]
_RATES = {3: [44100, 48000, 32000],  # MPEG-1
          2: [22050, 24000, 16000],  # MPEG-2
          0: [11025, 12000, 8000]}   # MPEG-2.5


def _parse_header(b: bytes, off: int):
    """Parse one 4-byte frame header at ``off`` ->
    (frame_bytes, sample_rate, n_channels, samples_per_frame)."""
    h = int.from_bytes(b[off : off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise Mp3Error(f"no frame sync at offset {off}")
    version_bits = (h >> 19) & 3
    if version_bits == 1:
        raise Mp3Error("reserved MPEG version")
    layer_bits = (h >> 17) & 3
    if layer_bits == 0:
        raise Mp3Error("reserved layer")
    layer = 4 - layer_bits  # 1, 2, 3
    bitrate_idx = (h >> 12) & 0xF
    if bitrate_idx == 0:
        raise Mp3Error("free-format bitrate not supported")
    if bitrate_idx == 0xF:
        raise Mp3Error("invalid bitrate index")
    rate_idx = (h >> 10) & 3
    if rate_idx == 3:
        raise Mp3Error("invalid sample-rate index")
    padding = (h >> 9) & 1
    channel_mode = (h >> 6) & 3
    n_channels = 1 if channel_mode == 3 else 2

    vgroup = 0 if version_bits == 3 else 1
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx - 1] * 1000
    sample_rate = _RATES[version_bits][rate_idx]

    if layer == 1:
        samples = 384
        frame_bytes = (12 * bitrate // sample_rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 0) else 576
        coeff = samples // 8
        frame_bytes = coeff * bitrate // sample_rate + padding
    return frame_bytes, sample_rate, n_channels, samples


def _skip_id3v2(b: bytes) -> int:
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = 0
    for i in range(6, 10):
        if b[i] & 0x80:
            raise Mp3Error("bad ID3v2 syncsafe size")
        size = (size << 7) | b[i]
    footer = 10 if (b[5] & 0x10) else 0
    return 10 + size + footer


def mp3_audio_stats(payload: bytes) -> tuple[int, int, int, int, float]:
    """``(sample_rate, n_channels, n_mpeg_frames, n_samples,
    duration_ms)`` by walking the frame chain — ``n_samples`` counts
    per-channel sample instants (the WAV kernel's frame notion) so the
    two kernels report commensurable quantities.  Mixed sample rates
    across frames are rejected (a sane stream never changes clock);
    the channel count reported is the first frame's.  Up to 2 bytes of
    trailing garbage are tolerated (encoder padding); a trailing ID3v1
    'TAG' block is skipped."""
    pos = _skip_id3v2(payload)
    if pos + 4 > len(payload):
        raise Mp3Error("no MPEG frame after ID3 tag")
    n_frames = 0
    total_samples = 0
    sample_rate = n_channels = None
    while pos + 4 <= len(payload):
        if payload[pos : pos + 3] == b"TAG":  # ID3v1 trailer
            pos += 128
            break
        fb, rate, ch, samples = _parse_header(payload, pos)
        if sample_rate is None:
            sample_rate, n_channels = rate, ch
        elif rate != sample_rate:
            raise Mp3Error("sample rate changes mid-stream")
        if fb <= 4:
            raise Mp3Error("degenerate frame length")
        if pos + fb > len(payload):
            raise Mp3Error("truncated final frame")
        n_frames += 1
        total_samples += samples
        pos += fb
    if n_frames == 0:
        raise Mp3Error("no MPEG frames")
    if len(payload) - pos > 2:
        raise Mp3Error(f"{len(payload) - pos} trailing non-frame bytes")
    return (
        sample_rate,
        n_channels,
        n_frames,
        total_samples,
        total_samples * 1000.0 / sample_rate,
    )


def encode_mp3_stub(
    n_frames: int,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    stereo: bool = True,
) -> bytes:
    """Structurally valid constant-bitrate MPEG-1 Layer-III frames with
    zeroed payloads — all the metadata contract under test requires."""
    try:
        rate_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
        bitrate_idx = _BITRATES[(0, 3)].index(bitrate_kbps) + 1
    except (KeyError, ValueError) as exc:
        raise Mp3Error(f"unsupported stub parameters: {exc}") from exc
    h = (
        (0x7FF << 21)
        | (3 << 19)  # MPEG-1
        | (1 << 17)  # Layer III
        | (1 << 16)  # no CRC
        | (bitrate_idx << 12)
        | (rate_idx << 10)
        | ((0 if stereo else 3) << 6)
    )
    header = h.to_bytes(4, "big")
    frame_bytes = 144 * bitrate_kbps * 1000 // sample_rate
    frame = header + b"\x00" * (frame_bytes - 4)
    return frame * n_frames
