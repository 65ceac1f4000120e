"""Multimodal column operators — binary payloads with typed metadata.

Extension surface (BASELINE.json north_star): treat image/audio/video as
opaque ``binary`` columns plus a typed ``meta`` struct, and run decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
functions over ``mapInPandas``.

Decode kernels (round 9; JPEG round 11): the image path is REAL
everywhere — Pillow when importable (the fast C path), else the
pure-stdlib PNG decoder (functions/png.py: zlib + struct + the five
scanline filters), the pure-stdlib baseline+progressive JPEG decoder
(functions/jpeg.py: Huffman + dequant + IDCT + YCbCr, grayscale and
4:4:4/4:2:2/4:2:0 color) and the pure-stdlib GIF decoder
(functions/gif.py: LZW + palettes + interlace + transparency), which
run on any executor's bare CPython.  The audio path is likewise REAL
for WAV/PCM payloads (functions/wav.py: struct-only RIFF parse,
8/16/24/32-bit int + 32/64-bit float, EXTENSIBLE) via
``extract_audio_features``, and the video path for AVI/BI_RGB payloads
(functions/avi.py: RIFF chunk tree, DIB frames normalized to top-down
RGB24) via ``decode_video`` / ``sample_frames(fake=False)``.  Image formats
beyond PNG and baseline/progressive JPEG without Pillow (webp, gif,
arithmetic-coded JPEG, ...), compressed audio, and compressed video
remain honestly probe-guarded
(NotImplementedError); ``fake=True`` keeps the deterministic
hash-derived decoder that exercises the full Spark-side plumbing —
schema, batch iteration, partition sizing — independent of any codec.

Scale notes:
- binary payloads ride the normal columnar path; co-locate them with
  their metadata and PARTITION BY content-defined buckets so a decode
  pass is embarrassingly parallel.
- ``mapInPandas`` streams Arrow batches — peak memory is one batch, not
  one partition.  The operators RE-CHUNK each incoming batch to
  ``max_records_per_batch`` rows inside the pandas iterator, so
  processing/output batch size is bounded without mutating the shared
  session's ``spark.sql.execution.arrow.maxRecordsPerBatch`` (a
  session-conf set here would leak into every later Arrow query, and a
  set-then-restore never takes effect under lazy evaluation — the conf
  is read at action time).  For very large payloads also set that conf
  session-wide at deployment so the JVM->Python transfer batches are
  small too.
- never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, sha256 string, "
    "fake_mean_luma double, fake_n_frames int"
)

IMAGE_FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, sha256 string, "
    "width int, height int, mean_luma double"
)


def _rebatch(
    frames: Iterator[pd.DataFrame], max_records: int
) -> Iterator[pd.DataFrame]:
    """Re-chunk incoming Arrow batches to ``max_records`` rows so
    processing/output batch size is bounded (see the module doc's
    memory note).  Used by the real-kernel wrappers; the fake-capable
    closures (``extract_features(fake=True)``, ``sample_frames``) keep
    a local copy so they stay stdlib-only picklable to workers without
    this package installed."""
    for big in frames:
        for s in range(0, max(len(big), 1), max_records):
            yield big.iloc[s : s + max_records]


def pil_available() -> bool:
    """True when a real image decoder (Pillow) is importable.  The
    container this repo is developed in ships none — the real kernel
    below lights up automatically wherever Pillow exists (mirrors the
    catalog-jar smoke pattern: capability-probed, never assumed)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def stdlib_image_stats(payload: bytes) -> tuple[int, int, float]:
    """Dispatch the stdlib image kernels by magic number: PNG
    (functions/png.py), baseline/progressive JPEG (functions/jpeg.py,
    round 11), GIF (functions/gif.py, round 11: LZW + palettes +
    interlace + transparency, first frame on the logical screen), BMP
    (incl. 16-bit RGB555/565, round 13), ICO/CUR (functions/ico.py,
    round 13 — largest directory image through the PNG/BMP kernels),
    or TIFF (functions/tiff.py — strips/tiles,
    none/LZW/deflate/PackBits, 8/16-bit samples, round 13).  Malformed payloads of a supported format raise their codec
    error (PngError/JpegError/GifError/TiffError/BmpError -> the
    corrupt->(0,0,NULL) degradation path); formats no kernel handles —
    and real JPEGs/TIFFs outside the supported profiles (arithmetic
    coding, 12-bit JPEG, CCITT/JPEG-in-TIFF) — raise
    NotImplementedError (the honest probe contract)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from datalakehouse_spark.functions.png import png_luma_stats

        return png_luma_stats(payload)
    if payload[:2] == b"\xff\xd8":
        from datalakehouse_spark.functions.jpeg import (
            JpegUnsupported,
            jpeg_luma_stats,
        )

        try:
            return jpeg_luma_stats(payload)
        except JpegUnsupported as exc:
            raise NotImplementedError(
                f"JPEG outside the supported profile needs Pillow: {exc}"
            ) from exc
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from datalakehouse_spark.functions.gif import gif_luma_stats

        return gif_luma_stats(payload)
    if payload[:2] == b"BM":
        from datalakehouse_spark.functions.bmp import bmp_luma_stats

        return bmp_luma_stats(payload)
    if payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        # ICO/CUR (round 13): directory of PNG- or DIB-wrapped images;
        # the largest decodes through the PNG/BMP kernels
        from datalakehouse_spark.functions.ico import ico_luma_stats

        return ico_luma_stats(payload)
    if (
        len(payload) >= 3
        and payload[0] == 0x50
        and 0x31 <= payload[1] <= 0x36
        and (payload[2 : 3].isspace() or payload[2] == 0x23)
    ):
        # Netpbm P1..P6 (round 13)
        from datalakehouse_spark.functions.pnm import pnm_luma_stats

        return pnm_luma_stats(payload)
    if payload[:4] == b"qoif":
        from datalakehouse_spark.functions.qoi import qoi_luma_stats

        return qoi_luma_stats(payload)
    if (
        len(payload) >= 128
        and payload[0] == 0x0A
        and payload[1] in (0, 2, 3, 4, 5)
        and payload[2] == 1
    ):
        # ZSoft PCX: weak 1-byte magic, so version/encoding gate it
        from datalakehouse_spark.functions.pcx import pcx_luma_stats

        return pcx_luma_stats(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from datalakehouse_spark.functions.tiff import (
            TiffUnsupported,
            tiff_luma_stats,
        )

        try:
            return tiff_luma_stats(payload)
        except TiffUnsupported as exc:
            raise NotImplementedError(
                f"TIFF outside the baseline uncompressed profile needs "
                f"Pillow: {exc}"
            ) from exc
    from datalakehouse_spark.functions.tga import looks_like_tga

    if looks_like_tga(payload):
        # TGA has NO magic: the structural sniff runs LAST so every
        # real magic wins first (round 13)
        from datalakehouse_spark.functions.tga import tga_luma_stats

        return tga_luma_stats(payload)
    raise NotImplementedError(
        "unsupported image format needs Pillow (pip install pillow); the "
        "stdlib kernels handle PNG, baseline/progressive JPEG, GIF, BMP "
        "(incl. 16-bit), ICO/CUR, Netpbm, QOI, PCX, TGA and strip/tiled "
        "LZW/deflate/PackBits TIFF"
    )


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """REAL image decode kernel: ``(width, height, mean_luma)`` of an
    encoded image payload.  Pillow when importable (any format it
    reads); otherwise the pure-stdlib PNG/baseline-JPEG decoders.  For
    PNG the two paths use the same ITU-R 601-2 integer luma and are
    bit-identical; for JPEG the stdlib kernel is spec-accurate but may
    differ from libjpeg's fast integer IDCT by the low bit of
    AC-heavy pixels (see functions/jpeg.py's honesty note) — DC-only
    blocks, which the oracle fixtures use, are exact everywhere.
    Unsupported formats raise NotImplementedError (the honest probe
    contract)."""
    if pil_available():
        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(payload)) as img:
            gray = img.convert("L")
            width, height = gray.size
            hist = gray.histogram()
            n = max(width * height, 1)
            mean_luma = sum(i * c for i, c in enumerate(hist)) / (255.0 * n)
        return width, height, mean_luma
    return stdlib_image_stats(payload)


def _fake_decode(payload: bytes) -> tuple[float, int]:
    """Deterministic stand-in for a real decoder: derive a 'mean luma'
    and 'frame count' from the payload bytes."""
    if payload is None:
        return float("nan"), 0
    h = hashlib.sha256(payload).digest()
    return h[0] / 255.0, 1 + h[1] % 32


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = True,
    max_records_per_batch: int = 256,
) -> DataFrame:
    """Decode/feature-extract pass over a media table via mapInPandas.

    ``fake=True`` (the default) runs the deterministic hash-derived
    decoder — codec-independent plumbing exercise.  ``fake=False`` runs
    the REAL kernel and returns ``IMAGE_FEATURE_SCHEMA``: Pillow per
    worker when importable (any format), else the stdlib PNG/JPEG/GIF
    dispatch (``stdlib_image_stats``) — real in every container.
    Undecodable payloads yield ``(0, 0, NaN)`` rather than failing the
    batch (a corrupt object must not kill a 100 TB pass).
    """
    if not fake:

        def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib as _hl

            # per-WORKER capability probe: Pillow's C path when present,
            # stdlib PNG otherwise — identical integer luma either way
            try:
                import io as _io

                from PIL import Image

                def _decode(data):
                    with Image.open(_io.BytesIO(data)) as img:
                        gray = img.convert("L")
                        w, h = gray.size
                        hist = gray.histogram()
                        n = max(w * h, 1)
                        return w, h, sum(
                            i * c for i, c in enumerate(hist)
                        ) / (255.0 * n)

            except ImportError:
                from datalakehouse_spark.operators.multimodal import (
                    stdlib_image_stats,
                )

                _decode = stdlib_image_stats

            for pdf in _rebatch(it, max_records_per_batch):
                widths, heights, lumas, shas, sizes = [], [], [], [], []
                for payload in pdf[payload_col]:
                    data = payload or b""
                    shas.append(_hl.sha256(data).hexdigest())
                    sizes.append(len(data))
                    try:
                        w, h, luma = _decode(data)
                    except Exception:
                        w, h, luma = 0, 0, float("nan")
                    widths.append(w)
                    heights.append(h)
                    lumas.append(luma)
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "media_type": pdf["media_type"],
                        "n_bytes": sizes,
                        "sha256": shas,
                        "width": widths,
                        "height": heights,
                        "mean_luma": lumas,
                    }
                )

        return df.mapInPandas(real_batches, schema=IMAGE_FEATURE_SCHEMA)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure (stdlib-only refs): safe to pickle to
        # workers that don't have this package installed
        import hashlib

        def _fake_decode(payload):
            if payload is None:
                return float("nan"), 0
            h = hashlib.sha256(payload).digest()
            return h[0] / 255.0, 1 + h[1] % 32

        def _chunks(frames):  # local twin of _rebatch: keeps the fake
            for big in frames:  # closure stdlib-only picklable
                for s in range(0, max(len(big), 1), max_records_per_batch):
                    yield big.iloc[s : s + max_records_per_batch]

        for pdf in _chunks(it):
            lumas, frames, shas, sizes = [], [], [], []
            for payload in pdf[payload_col]:
                luma, nframes = _fake_decode(payload)
                lumas.append(luma)
                frames.append(nframes)
                shas.append(hashlib.sha256(payload or b"").hexdigest())
                sizes.append(len(payload or b""))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "sha256": shas,
                    "fake_mean_luma": lumas,
                    "fake_n_frames": frames,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, sha256 string, "
    "sample_rate int, n_channels int, n_frames long, duration_ms double, "
    "rms double, peak double"
)


def _looks_like_mp3(payload: bytes) -> bool:
    if payload[:3] == b"ID3":
        return True
    return (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    )


def decode_audio(payload: bytes) -> tuple[int, int, int, float, float, float]:
    """REAL audio decode kernel: ``(sample_rate, n_channels, n_frames,
    duration_ms, rms, peak)`` — pure stdlib, runs on any executor.

    WAV/PCM (functions/wav.py) decodes fully.  FLAC (functions/flac.py)
    decodes fully as of round 13 — frames through the Rice/LPC kernel,
    rms/peak over the reconstructed PCM, falling back to the round-12
    STREAMINFO metadata pass (NaN rms/peak) for header-only payloads.
    MP3 (functions/mp3.py, round 11) and Ogg Vorbis/Opus
    (functions/ogg.py, round 12: page walk, last-granule sample count)
    are METADATA passes: real rate/channels/sample-count/duration, NaN
    rms/peak — Layer-III/Vorbis PCM synthesis genuinely needs a codec
    library.  Other compressed audio (aac/wma/...) raises
    NotImplementedError (the honest probe contract)."""
    from datalakehouse_spark.functions.wav import WavError, wav_pcm_stats

    if payload[:4] == b"RIFF":
        return wav_pcm_stats(payload)
    if _looks_like_mp3(payload):
        from datalakehouse_spark.functions.mp3 import mp3_audio_stats

        rate, ch, _mpeg_frames, n_samples, dur = mp3_audio_stats(payload)
        return rate, ch, n_samples, dur, float("nan"), float("nan")
    if payload[:4] == b"OggS":
        from datalakehouse_spark.functions.ogg import ogg_audio_stats

        rate, ch, n_samples, dur = ogg_audio_stats(payload)
        return rate, ch, n_samples, dur, float("nan"), float("nan")
    if payload[:4] == b"fLaC":
        from datalakehouse_spark.functions.flac import (
            FlacError,
            flac_audio_stats,
            flac_decode_pcm,
        )

        try:
            rate, ch, bps, inter, _md5_ok = flac_decode_pcm(payload)
        except FlacError:
            # header-only / frameless payload: the metadata contract
            rate, ch, n_samples, dur = flac_audio_stats(payload)
            return rate, ch, n_samples, dur, float("nan"), float("nan")
        n = len(inter)
        frames = n // ch if ch else 0
        if n == 0:
            return rate, ch, 0, 0.0, 0.0, 0.0
        scale = float(1 << (bps - 1))  # normalized [-1, 1], WAV contract
        acc = 0.0
        peak = 0.0
        for s in inter:
            v = s / scale
            acc += v * v
            a = -v if v < 0 else v
            if a > peak:
                peak = a
        rms = (acc / n) ** 0.5
        return rate, ch, frames, frames * 1000.0 / rate, rms, peak
    try:
        return wav_pcm_stats(payload)
    except WavError as exc:
        raise NotImplementedError(
            "compressed audio decode (aac/wma/...) needs a codec "
            "library; the stdlib kernels handle WAV PCM/float fully and "
            "MP3/Ogg/FLAC as metadata passes"
        ) from exc


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    max_records_per_batch: int = 256,
) -> DataFrame:
    """Audio feature pass over a media table via mapInPandas — the REAL
    WAV/PCM kernel plus the MP3/Ogg/FLAC metadata walkers (stdlib,
    every container), same batching contract as ``extract_features``.
    Metadata-pass rows carry real rate/channels/frames/duration with
    NaN rms/peak; undecodable payloads degrade to
    zero-frame rows with NULL rms/peak instead of failing the batch (a
    corrupt object must not kill a 100 TB pass)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        from datalakehouse_spark.operators.multimodal import decode_audio

        for pdf in _rebatch(it, max_records_per_batch):
            cols: dict = {
                "n_bytes": [], "sha256": [], "sample_rate": [],
                "n_channels": [], "n_frames": [], "duration_ms": [],
                "rms": [], "peak": [],
            }
            for payload in pdf[payload_col]:
                data = payload or b""
                cols["sha256"].append(_hl.sha256(data).hexdigest())
                cols["n_bytes"].append(len(data))
                try:
                    rate, n_ch, frames, dur, rms, peak = decode_audio(data)
                except Exception:
                    rate, n_ch, frames, dur = 0, 0, 0, 0.0
                    rms = peak = float("nan")
                cols["sample_rate"].append(rate)
                cols["n_channels"].append(n_ch)
                cols["n_frames"].append(frames)
                cols["duration_ms"].append(dur)
                cols["rms"].append(rms)
                cols["peak"].append(peak)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    **cols,
                }
            )

    return df.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_STATS_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, sha256 string, "
    "width int, height int, fps double, n_frames int, duration_ms double"
)


def decode_video(payload: bytes) -> tuple[int, int, float, int, float]:
    """REAL video decode kernel (metadata pass): ``(width, height, fps,
    n_frames, duration_ms)`` of an AVI, MP4/ISO-BMFF, Matroska/WebM,
    or animated-GIF payload — pure stdlib (functions/avi.py;
    functions/mp4.py since round 11: box-tree walk of
    tkhd/mdhd/hdlr/stsz/stts; functions/mkv.py since round 12: EBML
    walk of Info/Tracks/Cluster, lacing-aware block counting;
    functions/gif.py since round 13: graphic-control delay walk — the
    web-scrape "video" format byte-level dedup always misses), so it
    runs on any executor.  Frame PIXELS of MP4/MKV still need a codec
    library (``sample_frames`` keeps its probe guard for those; AVI
    decodes BI_RGB and MJPEG pixels, GIF composites every frame for
    real).  Other containers raise NotImplementedError (the honest
    probe contract: a real deployment adds ffmpeg)."""
    from datalakehouse_spark.functions.avi import AviError, avi_video_stats
    from datalakehouse_spark.functions.mkv import MKV_MAGIC, mkv_video_stats
    from datalakehouse_spark.functions.mp4 import mp4_video_stats

    if payload[:4] == b"RIFF":
        return avi_video_stats(payload)
    if payload[4:8] in (b"ftyp", b"moov", b"mdat", b"free", b"wide", b"styp"):
        return mp4_video_stats(payload)
    if payload[:4] == MKV_MAGIC:
        return mkv_video_stats(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from datalakehouse_spark.functions.gif import gif_video_stats

        w, h, n_frames, fps, duration_ms = gif_video_stats(payload)
        return w, h, fps, n_frames, duration_ms
    raise NotImplementedError(
        "non-AVI/MP4/MKV/GIF video decode needs ffmpeg; the stdlib "
        "kernels handle RIFF AVI, ISO BMFF, Matroska/WebM and animated "
        "GIF metadata"
    )


def extract_video_features(
    df: DataFrame,
    payload_col: str = "payload",
    max_records_per_batch: int = 256,
) -> DataFrame:
    """Video metadata pass over a media table via mapInPandas — the REAL
    AVI kernel (stdlib, every container), same batching contract as
    ``extract_features``.  Undecodable payloads degrade to zero-frame
    rows with NULL fps/duration instead of failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        from datalakehouse_spark.functions.avi import avi_video_stats
        from datalakehouse_spark.functions.mkv import MKV_MAGIC, mkv_video_stats
        from datalakehouse_spark.functions.mp4 import mp4_video_stats

        def _stats(data: bytes):
            if data[:4] == b"RIFF":
                return avi_video_stats(data)
            if data[:4] == MKV_MAGIC:
                return mkv_video_stats(data)
            return mp4_video_stats(data)

        for pdf in _rebatch(it, max_records_per_batch):
            cols: dict = {
                "n_bytes": [], "sha256": [], "width": [], "height": [],
                "fps": [], "n_frames": [], "duration_ms": [],
            }
            for payload in pdf[payload_col]:
                data = payload or b""
                cols["sha256"].append(_hl.sha256(data).hexdigest())
                cols["n_bytes"].append(len(data))
                try:
                    w, h, fps, n, dur = _stats(data)
                except Exception:
                    w = h = n = 0
                    fps = dur = float("nan")
                cols["width"].append(w)
                cols["height"].append(h)
                cols["fps"].append(fps)
                cols["n_frames"].append(n)
                cols["duration_ms"].append(dur)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    **cols,
                }
            )

    return df.mapInPandas(batches, schema=VIDEO_STATS_SCHEMA)


IMAGE_FP_SCHEMA = "asset_id long, width int, height int, pixel_md5 string"


def image_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
    max_records_per_batch: int = 256,
) -> DataFrame:
    """Pixel-level image fingerprints for CROSS-FORMAT dedup: decode
    each payload to its 8-bit luma plane (PNG/GIF/BMP/TIFF/JPEG/ICO —
    the real stdlib kernels, all sharing the ITU-R 601-2 integer luma) and
    md5 it.  Two files carrying the SAME pixels in different lossless
    containers fingerprint identically — the dedup key a multimodal
    training corpus needs, where the same image circulates re-encoded
    (lossy JPEG fingerprints stand alone, honestly: its pixels really
    differ).  Undecodable payloads contribute zero rows (count them in
    ``extract_features``).  Same Arrow-batched mapInPandas contract as
    every decode pass — no driver traffic, embarrassingly parallel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        from datalakehouse_spark.functions.bmp import decode_bmp
        from datalakehouse_spark.functions.gif import decode_gif
        from datalakehouse_spark.functions.ico import decode_ico
        from datalakehouse_spark.functions.jpeg import decode_jpeg
        from datalakehouse_spark.functions.png import decode_png
        from datalakehouse_spark.functions.tiff import decode_tiff

        def _plane(data: bytes) -> tuple[int, int, bytes]:
            if data[:8] == b"\x89PNG\r\n\x1a\n":
                return decode_png(data)
            if data[:2] == b"\xff\xd8":
                return decode_jpeg(data)
            if data[:6] in (b"GIF87a", b"GIF89a"):
                w, h, luma, _n = decode_gif(data)
                return w, h, luma
            if data[:2] == b"BM":
                return decode_bmp(data)
            if data[:4] in (b"II*\x00", b"MM\x00*"):
                return decode_tiff(data)
            if data[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
                # ICO/CUR (round 13): an icon wrapping the same pixels
                # as a bare PNG/BMP fingerprints identically
                return decode_ico(data)
            if (
                len(data) >= 3
                and data[0] == 0x50
                and 0x31 <= data[1] <= 0x36
                and (data[2 : 3].isspace() or data[2] == 0x23)
            ):
                from datalakehouse_spark.functions.pnm import decode_pnm

                return decode_pnm(data)
            if data[:4] == b"qoif":
                from datalakehouse_spark.functions.qoi import decode_qoi

                return decode_qoi(data)
            if (
                len(data) >= 128
                and data[0] == 0x0A
                and data[1] in (0, 2, 3, 4, 5)
                and data[2] == 1
            ):
                from datalakehouse_spark.functions.pcx import decode_pcx

                return decode_pcx(data)
            from datalakehouse_spark.functions.tga import looks_like_tga

            if looks_like_tga(data):  # no magic: sniff LAST
                from datalakehouse_spark.functions.tga import decode_tga

                return decode_tga(data)
            raise NotImplementedError("no stdlib pixel kernel for this magic")

        for pdf in _rebatch(it, max_records_per_batch):
            ids, ws, hs, fps = [], [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf[payload_col]):
                try:
                    w, h, luma = _plane(bytes(payload or b""))
                except Exception:
                    continue  # undecodable -> zero rows
                ids.append(asset_id)
                ws.append(w)
                hs.append(h)
                fps.append(_hl.md5(luma).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "width": ws, "height": hs, "pixel_md5": fps}
            )

    return df.mapInPandas(batches, schema=IMAGE_FP_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_idx int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    stride: int = 4,
    fake: bool = True,
    max_records_per_batch: int = 256,
) -> DataFrame:
    """Frame-sampling pass: one asset row fans out to one row per
    sampled frame (every ``stride``-th), the 1->N mapInPandas shape a
    video pipeline uses.

    ``fake=False`` runs the REAL kernels: each sampled AVI frame —
    BI_RGB raw, or MJPEG through the real JPEG entropy decoder (round
    12) — and (round 13) each animated-GIF frame COMPOSITED through
    the disposal/transparency state machine (functions/gif.py) is
    normalized to top-down RGB24 and fingerprinted with md5 — the
    frame-level dedup key — so two writers encoding the same pixels in
    different containers (or at different bpp/row order) fingerprint
    identically.  Undecodable or otherwise-compressed payloads
    contribute ZERO rows (a corrupt object must not kill a 100 TB
    pass; count them via ``extract_video_features`` where they surface
    as zero-frame rows).  A real deployment swaps in ffmpeg keyframe
    extraction for the remaining codecs (H264/VP9/...) — the Spark
    contract (Arrow batch iteration, fan-out schema, no driver
    traffic) is identical.

    ``fake=True`` keeps the deterministic hash-derived decoder (frame
    count and fingerprints from the payload hash) for codec-independent
    plumbing tests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _chunks(frames):
            for big in frames:
                for s in range(0, max(len(big), 1), max_records_per_batch):
                    yield big.iloc[s : s + max_records_per_batch]

        if not fake:
            from datalakehouse_spark.functions.avi import avi_iter_frames
            from datalakehouse_spark.functions.gif import gif_iter_frames

        for pdf in _chunks(it):
            ids, idxs, fps = [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf[payload_col]):
                if fake:
                    sha = hashlib.sha256(payload or b"").hexdigest()
                    n_frames = 1 + int(sha[2:4], 16) % 32
                    for i in range(0, n_frames, stride):
                        ids.append(asset_id)
                        idxs.append(i)
                        fps.append(hashlib.md5(f"{sha}:{i}".encode()).hexdigest())
                    continue
                # buffer per asset and commit only on full success: a
                # payload truncated MID-stream must contribute ZERO
                # rows (the documented contract), not the frames
                # decoded before the parse error
                asset_rows = []
                iter_frames = (
                    gif_iter_frames
                    if (payload or b"")[:6] in (b"GIF87a", b"GIF89a")
                    else avi_iter_frames
                )
                try:
                    for i, rgb in iter_frames(payload or b"", stride):
                        asset_rows.append((i, hashlib.md5(rgb).hexdigest()))
                except Exception:
                    continue  # undecodable asset -> zero rows
                for i, digest in asset_rows:
                    ids.append(asset_id)
                    idxs.append(i)
                    fps.append(digest)
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame_md5": fps})

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def synthesize_assets_from_documents(docs: DataFrame, n: int = 100) -> DataFrame:
    """Build a deterministic media_assets fixture by reusing document
    text bytes as payloads (the fixtures ship no binary column)."""
    return (
        docs.orderBy("doc_id")  # deterministic selection
        .limit(n)
        .select(
            F.col("doc_id").alias("asset_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.encode("text", "UTF-8").alias("payload"),
            F.struct(
                F.lit(64).alias("width"),
                F.lit(64).alias("height"),
                (F.length("text") * 10).cast("long").alias("duration_ms"),
                F.lit("fake").alias("codec"),
            ).alias("meta"),
        )
    )
