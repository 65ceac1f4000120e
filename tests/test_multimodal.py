"""Multimodal binary-column plumbing + the real image-decode kernel
(Pillow where present, pure-stdlib PNG everywhere — round 9)."""

import pytest

from datalakehouse_spark.io import load_table
from datalakehouse_spark.operators.multimodal import (
    extract_features,
    synthesize_assets_from_documents,
)


def test_feature_extraction_plumbing(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    assets = synthesize_assets_from_documents(docs, n=50)
    feats = extract_features(assets, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert len(r.sha256) == 64
    assert 0.0 <= r.fake_mean_luma <= 1.0
    assert 1 <= r.fake_n_frames <= 32
    assert r.n_bytes > 0
    assert r.media_type in ("image", "audio", "video")


def test_feature_extraction_deterministic(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    assets = synthesize_assets_from_documents(docs, n=20)
    a = sorted(map(str, extract_features(assets).collect()))
    b = sorted(map(str, extract_features(assets).collect()))
    assert a == b


def test_unsupported_format_without_pillow_is_explicitly_stubbed():
    """Honest-probe contract: PNG, JPEG (baseline+progressive) and GIF
    are stdlib-decodable (rounds 9/11); formats beyond those still
    need Pillow and must say so.  A supported-magic payload routes to
    its real kernel — corrupt ones raise the codec error (the
    (0,0,NULL) degradation path), not NotImplementedError."""
    from datalakehouse_spark.functions.gif import GifError
    from datalakehouse_spark.functions.jpeg import JpegError
    from datalakehouse_spark.operators.multimodal import decode_image, pil_available

    if pil_available():
        pytest.skip("Pillow present: every format it reads lights up instead")
    from datalakehouse_spark.functions.tiff import TiffError

    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x00\x00\x0cjP   jpeg2000-ish bytes")
    # round 12: tiff magic routes to the REAL baseline kernel — junk is
    # the codec error (degradation path), compressed profiles probe out
    with pytest.raises(TiffError):
        decode_image(b"II*\x00 tiff-ish bytes not decodable here")
    with pytest.raises(JpegError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish bytes")
    with pytest.raises(GifError):
        decode_image(b"GIF89a truncated gif-ish bytes")


def test_real_kernel_end_to_end_stdlib_png(spark):
    """The REAL decode path (fake=False), unskipped in this container:
    generated PNGs with known luma flow through mapInPandas; a corrupt
    payload degrades to (0, 0, NaN) instead of failing the batch."""
    import math

    from datalakehouse_spark.functions.png import encode_png
    from datalakehouse_spark.operators.multimodal import decode_image

    checker = encode_png(2, 2, bytes([0, 255, 255, 0]), color_type=0)
    red = encode_png(3, 1, bytes([255, 0, 0] * 3), color_type=2)
    w, h, luma = decode_image(checker)
    assert (w, h) == (2, 2) and luma == pytest.approx(0.5)

    assets = spark.createDataFrame(
        [
            (1, "image", checker),
            (2, "image", red),
            (3, "image", b"corrupt \x00 bytes"),
        ],
        "asset_id long, media_type string, payload binary",
    )
    rows = {r.asset_id: r for r in extract_features(assets, fake=False).collect()}
    assert (rows[1].width, rows[1].height) == (2, 2)
    assert rows[1].mean_luma == pytest.approx(0.5)
    assert (rows[2].width, rows[2].height) == (3, 1)
    assert rows[2].mean_luma == pytest.approx(76 / 255.0)
    assert (rows[3].width, rows[3].height) == (0, 0)
    # NaN is pandas' missing marker, so Arrow surfaces it as NULL
    assert rows[3].mean_luma is None or math.isnan(rows[3].mean_luma)
    assert rows[3].n_bytes == len(b"corrupt \x00 bytes")


def test_real_decode_golden_when_pil_present(spark):
    """Golden test for the REAL Pillow kernel — runs wherever Pillow is
    installed, skips in this container (mirrors the catalog-jar smoke
    pattern: capability-probed, never assumed)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from datalakehouse_spark.operators.multimodal import decode_image

    # 2x2 grayscale PNG with known pixel values -> exact mean luma
    img = PIL.new("L", (2, 2))
    img.putdata([0, 255, 255, 0])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    w, h, luma = decode_image(payload)
    assert (w, h) == (2, 2)
    assert luma == pytest.approx(0.5)

    assets = spark.createDataFrame(
        [(1, "image", payload)], "asset_id long, media_type string, payload binary"
    )
    row = extract_features(assets, fake=False).first()
    assert (row.width, row.height) == (2, 2)
    assert row.mean_luma == pytest.approx(0.5)
    assert row.n_bytes == len(payload)


def test_wav_kernel_roundtrip_and_formats():
    """The stdlib WAV codec: encode→decode round trip with known RMS
    (a full-scale sine has rms 1/sqrt(2)), plus the non-16-bit sample
    formats assembled by hand."""
    import math
    import struct

    from datalakehouse_spark.functions.wav import (
        WavError,
        encode_wav,
        wav_pcm_stats,
    )

    n = 16000
    sine = [math.sin(2 * math.pi * 440 * i / n) for i in range(n)]
    payload = encode_wav(sine, sample_rate=n)
    rate, n_ch, frames, dur, rms, peak = wav_pcm_stats(payload)
    assert (rate, n_ch, frames) == (n, 1, n)
    assert dur == pytest.approx(1000.0)
    assert rms == pytest.approx(1 / math.sqrt(2), rel=1e-3)
    assert peak == pytest.approx(1.0, rel=1e-3)

    # stereo framing: frames = samples / channels
    stereo = encode_wav([0.5, -0.5] * 100, sample_rate=8000, n_channels=2)
    rate, n_ch, frames, dur, rms, peak = wav_pcm_stats(stereo)
    assert (n_ch, frames) == (2, 100)
    assert rms == pytest.approx(0.5, rel=1e-3)

    # 32-bit IEEE float fmt (tag 3), hand-assembled
    vals = struct.pack("<4f", 1.0, -1.0, 0.0, 0.0)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(vals)) + vals
    )
    f32 = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, n_ch, frames, dur, rms, peak = wav_pcm_stats(f32)
    assert frames == 4 and peak == 1.0
    assert rms == pytest.approx(math.sqrt(0.5))

    # 8-bit unsigned: 128 is zero-centered silence
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body8 = (
        b"WAVEfmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", 4) + bytes([128, 128, 128, 128])
    )
    w8 = b"RIFF" + struct.pack("<I", len(body8)) + body8
    assert wav_pcm_stats(w8)[4] == 0.0

    # mu-law decodes as of round 13 (code 0x00 = -32124); codecs the
    # kernel still lacks (GSM 6.10, tag 49) stay loudly rejected
    fmt_mulaw = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    bodym = (
        b"WAVEfmt " + struct.pack("<I", len(fmt_mulaw)) + fmt_mulaw
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    mulaw = b"RIFF" + struct.pack("<I", len(bodym)) + bodym
    rate, n_ch, frames, _, _, peak = wav_pcm_stats(mulaw)
    assert (rate, n_ch, frames) == (8000, 1, 2)
    assert abs(peak - 32124 / 32768.0) < 1e-12
    fmt_gsm = struct.pack("<HHIIHH", 49, 1, 8000, 1625, 65, 0)
    bodyg = (
        b"WAVEfmt " + struct.pack("<I", len(fmt_gsm)) + fmt_gsm
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(WavError, match="codec library"):
        wav_pcm_stats(b"RIFF" + struct.pack("<I", len(bodyg)) + bodyg)


def test_decode_audio_probe_contract():
    """Round 11: MP3 metadata is REAL (functions/mp3.py) — an
    mp3-sync payload routes to the frame walker, whose malformed-input
    error fires (degradation path), NOT the probe guard.  Formats no
    kernel handles still say 'needs a codec library'."""
    from datalakehouse_spark.functions.mp3 import Mp3Error
    from datalakehouse_spark.operators.multimodal import decode_audio

    from datalakehouse_spark.functions.ogg import OggError

    with pytest.raises(Mp3Error):
        decode_audio(b"\xff\xfb mp3-ish bytes")
    with pytest.raises(OggError):
        decode_audio(b"OggS vorbis-ish bytes")
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xffJUNK aac-ish bytes" )


def test_real_audio_kernel_end_to_end(spark):
    """extract_audio_features over mapInPandas: generated WAVs flow
    through with exact stats; a corrupt payload degrades to a
    zero-frame row with NULL rms instead of failing the batch."""
    import math

    from datalakehouse_spark.functions.wav import encode_wav
    from datalakehouse_spark.operators.multimodal import extract_audio_features

    tone = encode_wav(
        [math.sin(2 * math.pi * 220 * i / 8000) for i in range(4000)],
        sample_rate=8000,
    )
    silence = encode_wav([0.0] * 800, sample_rate=8000)
    assets = spark.createDataFrame(
        [
            (1, "audio", tone),
            (2, "audio", silence),
            (3, "audio", b"corrupt \x00 bytes"),
        ],
        "asset_id long, media_type string, payload binary",
    )
    rows = {r.asset_id: r for r in extract_audio_features(assets).collect()}
    assert rows[1].sample_rate == 8000
    assert rows[1].n_frames == 4000
    assert rows[1].duration_ms == pytest.approx(500.0)
    assert rows[1].rms == pytest.approx(1 / math.sqrt(2), rel=1e-3)
    assert rows[2].rms == 0.0 and rows[2].peak == 0.0
    assert rows[3].n_frames == 0
    assert rows[3].rms is None or math.isnan(rows[3].rms)
    assert rows[3].n_bytes == len(b"corrupt \x00 bytes")


def test_avi_kernel_roundtrip_and_normalization():
    """The stdlib AVI codec: the encoder writes bottom-up BGR DIB rows
    with 4-byte padding, the decoder must return top-down unpadded
    RGB24 — a round trip proves the normalization, and stats count the
    real movi chunks."""
    from datalakehouse_spark.functions.avi import (
        AviError,
        avi_iter_frames,
        avi_video_stats,
        encode_avi,
    )

    # width 5 -> stride 15 pads to 16: the padding path is exercised
    frames = [bytes((k * 37 + i) % 256 for i in range(5 * 3 * 3)) for k in range(4)]
    payload = encode_avi(frames, 5, 3, fps=8)
    assert avi_video_stats(payload) == (5, 3, 8.0, 4, 500.0)
    decoded = list(avi_iter_frames(payload, stride=1))
    assert [i for i, _ in decoded] == [0, 1, 2, 3]
    assert all(decoded[k][1] == frames[k] for k in range(4))
    # stride sampling picks every stride-th frame, bytes intact
    sampled = list(avi_iter_frames(payload, stride=3))
    assert [i for i, _ in sampled] == [0, 3]
    assert sampled[1][1] == frames[3]

    with pytest.raises(AviError):
        avi_video_stats(b"not an avi")

    # compressed fourcc: stats fine (metadata pass), frames rejected
    import struct

    strf_at = payload.find(struct.pack("<Ii", 40, 5))
    compressed = (
        payload[: strf_at + 16]
        + struct.pack("<I", 0x34363248)  # 'H264'
        + payload[strf_at + 20 :]
    )
    assert avi_video_stats(compressed)[3] == 4
    with pytest.raises(AviError, match="codec"):
        list(avi_iter_frames(compressed))


def test_decode_video_probe_contract():
    """Round 11/12: MP4 and MKV metadata are REAL — magic-routed
    payloads reach their parsers, whose malformed-input errors fire
    (the zero-row degradation path), NOT the probe guard.  Containers
    no kernel handles still say 'needs ffmpeg'."""
    from datalakehouse_spark.functions.mkv import MkvError
    from datalakehouse_spark.functions.mp4 import Mp4Error
    from datalakehouse_spark.operators.multimodal import decode_video

    with pytest.raises(Mp4Error):
        decode_video(b"\x00\x00\x00\x20ftypisom mp4-ish bytes")
    with pytest.raises(MkvError):
        decode_video(b"\x1a\x45\xdf\xa3 matroska-ish bytes")
    with pytest.raises(NotImplementedError):
        decode_video(b"FLV\x01 flash-video-ish bytes")


def test_real_video_kernel_end_to_end(spark):
    """sample_frames(fake=False) + extract_video_features over
    mapInPandas: a generated AVI fans out to per-frame md5 rows that
    match a local decode; corrupt payloads contribute zero frame rows
    but still surface (zero-frame, NaN fps) in the stats pass."""
    import hashlib
    import math

    from datalakehouse_spark.functions.avi import avi_iter_frames, encode_avi
    from datalakehouse_spark.operators.multimodal import (
        extract_video_features,
        sample_frames,
    )

    frames = [bytes((k * 11 + i) % 256 for i in range(4 * 2 * 3)) for k in range(6)]
    payload = encode_avi(frames, 4, 2, fps=12)
    expected = {
        i: hashlib.md5(rgb).hexdigest() for i, rgb in avi_iter_frames(payload, 2)
    }
    assets = spark.createDataFrame(
        [(1, "video", payload), (2, "video", b"corrupt \x00 bytes")],
        "asset_id long, media_type string, payload binary",
    )
    out = sample_frames(assets, stride=2, fake=False).collect()
    assert {r.asset_id for r in out} == {1}
    assert {r.frame_idx: r.frame_md5 for r in out} == expected

    stats = {r.asset_id: r for r in extract_video_features(assets).collect()}
    assert (stats[1].width, stats[1].height, stats[1].n_frames) == (4, 2, 6)
    assert stats[1].fps == pytest.approx(12.0)
    assert stats[1].duration_ms == pytest.approx(500.0)
    assert stats[2].n_frames == 0
    assert stats[2].fps is None or math.isnan(stats[2].fps)


def test_sample_frames_truncated_midstream_contributes_zero_rows(spark):
    """A payload cut INSIDE the movi list (partial download) must
    contribute ZERO frame rows — not the frames decoded before the
    parse error — or frame-level dedup treats two byte-identical
    videos differently depending on where truncation hit."""
    from datalakehouse_spark.functions.avi import encode_avi
    from datalakehouse_spark.operators.multimodal import sample_frames

    frames = [bytes((k * 7 + i) % 256 for i in range(4 * 2 * 3)) for k in range(4)]
    payload = encode_avi(frames, 4, 2, fps=10)
    truncated = payload[: len(payload) - 30]  # cuts the last frame chunk
    assets = spark.createDataFrame(
        [(1, "video", payload), (2, "video", truncated)],
        "asset_id long, media_type string, payload binary",
    )
    out = sample_frames(assets, stride=1, fake=False).collect()
    assert {r.asset_id for r in out} == {1}
    assert len(out) == 4


def test_avi_multi_stream_decodes_only_the_vids_stream():
    """An AVI with an audio stream FIRST (vids is stream 01): frame
    chunks are tagged 01db and the 00wb audio chunks must be skipped —
    both by stats (no double counting) and by the frame reader (no
    decoding audio bytes with video geometry)."""
    import struct

    from datalakehouse_spark.functions.avi import (
        avi_iter_frames,
        avi_video_stats,
        encode_avi,
    )

    frames = [bytes((k * 13 + i) % 256 for i in range(3 * 2 * 3)) for k in range(2)]
    base = encode_avi(frames, 3, 2, fps=10)

    # rebuild: insert an 'auds' strl BEFORE the vids strl and an 00wb
    # chunk in movi; retag the video frames 00db -> 01db
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    auds_strh = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, 0, 0)
    )
    auds_strl = b"strl" + chunk(b"strh", auds_strh) + chunk(b"strf", struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8))

    # locate pieces of the original file
    hdrl_at = base.find(b"LIST")
    (hdrl_len,) = struct.unpack_from("<I", base, hdrl_at + 4)
    hdrl_body = base[hdrl_at + 8 : hdrl_at + 8 + hdrl_len]  # 'hdrl' + avih + vids strl
    (avih_len,) = struct.unpack_from("<I", hdrl_body, 8)
    avih_end = 4 + 8 + avih_len + (avih_len & 1)  # 'hdrl' tag + avih chunk
    new_hdrl = (
        hdrl_body[:avih_end]
        + b"LIST" + struct.pack("<I", len(auds_strl)) + auds_strl
        + hdrl_body[avih_end:]
    )
    movi_at = base.find(b"LIST", hdrl_at + 8 + hdrl_len)
    (movi_len,) = struct.unpack_from("<I", base, movi_at + 4)
    movi_body = base[movi_at + 8 : movi_at + 8 + movi_len]
    new_movi = (b"movi" + chunk(b"00wb", b"\xaa" * 37)
                + movi_body[4:].replace(b"00db", b"01db"))
    rebuilt = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(new_hdrl) + 8 + len(new_movi)) + b"AVI "
        + b"LIST" + struct.pack("<I", len(new_hdrl)) + new_hdrl
        + b"LIST" + struct.pack("<I", len(new_movi)) + new_movi
    )

    w, h, fps, n, dur = avi_video_stats(rebuilt)
    assert (w, h, n) == (3, 2, 2)  # audio chunk NOT counted
    decoded = list(avi_iter_frames(rebuilt))
    assert [i for i, _ in decoded] == [0, 1]
    assert all(decoded[k][1] == frames[k] for k in range(2))


def test_mjpeg_avi_pixel_decode_roundtrip():
    """Round 12: MJPEG frames decode to REAL pixels through the JPEG
    entropy decoder.  Constant-block frames round-trip exactly (the
    DC-only trick), DHT-less frames (the real-world OpenDML shape)
    decode bit-identically via the Annex-K standard-table splice, and
    non-MJPEG compressions still refuse loudly."""
    import struct

    from datalakehouse_spark.functions.avi import (
        AviError,
        _ensure_dht,
        _strip_dht,
        avi_iter_frames,
        avi_video_stats,
        encode_avi_mjpeg,
    )
    from datalakehouse_spark.functions.jpeg import decode_jpeg, encode_jpeg

    def block_rep(pix, bw):
        width = bw * 8
        out = bytearray(width * width)
        for i, v in enumerate(pix):
            brow, bcol = divmod(i, bw)
            for x in range(8):
                off = (brow * 8 + x) * width + bcol * 8
                out[off : off + 8] = bytes([v]) * 8
        return bytes(out)

    f0, f1 = bytes(range(4)), bytes(range(200, 204))
    jpegs = [encode_jpeg(16, 16, block_rep(f, 2)) for f in (f0, f1)]

    for strip in (False, True):
        avi = encode_avi_mjpeg(jpegs, 16, 16, fps=8, strip_dht=strip)
        assert avi_video_stats(avi) == (16, 16, 8.0, 2, 250.0)
        decoded = list(avi_iter_frames(avi))
        assert [i for i, _ in decoded] == [0, 1]
        for (idx, rgb), src in zip(decoded, (f0, f1)):
            luma = block_rep(src, 2)
            # gray -> RGB24 replication, top-down row-major
            assert rgb[0::3] == luma and rgb[1::3] == luma and rgb[2::3] == luma

    # stride sampling works through the MJPEG path
    avi3 = encode_avi_mjpeg(jpegs + jpegs[:1], 16, 16)
    assert [i for i, _ in avi_iter_frames(avi3, stride=2)] == [0, 2]

    # the DHT splice is structural: tables really absent, really restored
    bare = _strip_dht(jpegs[0])
    assert b"\xff\xc4" not in bare and b"\xff\xc4" in _ensure_dht(bare)
    assert decode_jpeg(_ensure_dht(bare)) == decode_jpeg(jpegs[0])
    # idempotent on frames that already carry tables
    assert _ensure_dht(jpegs[0]) == jpegs[0]

    # frame/header dimension disagreement is loud
    with pytest.raises(AviError, match="disagrees"):
        list(avi_iter_frames(encode_avi_mjpeg(jpegs, 64, 64)))

    # a COLOR MJPEG frame (lossy) still decodes to the jpeg kernel's luma
    rgbpx = bytes((i * 31) % 256 for i in range(8 * 8 * 3))
    jpc = encode_jpeg(8, 8, rgbpx, color=True)
    ((_, rgb),) = avi_iter_frames(encode_avi_mjpeg([jpc], 8, 8, strip_dht=True))
    _, _, luma = decode_jpeg(jpc)
    assert rgb[0::3] == luma

    # non-MJPEG fourcc still refuses
    base = encode_avi_mjpeg(jpegs, 16, 16)
    strf_at = base.find(struct.pack("<Ii", 40, 16))
    h264 = (
        base[: strf_at + 16]
        + struct.pack("<I", 0x34363248)
        + base[strf_at + 20 :]
    )
    with pytest.raises(AviError, match="codec"):
        list(avi_iter_frames(h264))


def test_mjpeg_fill_bytes_before_markers_decode():
    """ADVICE r12: spec-legal 0xFF fill bytes padding a marker must not
    break the header scan — a padded MJPEG frame decodes identically."""
    from datalakehouse_spark.functions.avi import _ensure_dht, _iter_jpeg_segments
    from datalakehouse_spark.functions.jpeg import decode_jpeg, encode_jpeg

    jpeg = encode_jpeg(8, 8, bytes(range(64)))
    # pad every header marker (after SOI, before SOS) with fill bytes
    segs = list(_iter_jpeg_segments(jpeg))  # SOI itself is not yielded
    padded = bytearray(jpeg[:2])
    for marker, start, length in segs:
        padded += b"\xff\xff\xff" + jpeg[start : start + length]
        if marker == 0xDA:
            padded += jpeg[start + length :]  # entropy data + EOI
    padded = bytes(padded)
    assert [m for m, _, _ in _iter_jpeg_segments(padded)] == [m for m, _, _ in segs]
    assert decode_jpeg(_ensure_dht(padded)) == decode_jpeg(jpeg)


def test_mjpeg_partial_dht_gets_only_missing_tables():
    """ADVICE r12: a frame carrying PARTIAL Huffman tables (e.g. DC but
    not AC) gets only the absent standard tables spliced in — and still
    decodes bit-identically."""
    import struct as _struct

    from datalakehouse_spark.functions.avi import (
        _dht_tables_present,
        _ensure_dht,
        _iter_jpeg_segments,
    )
    from datalakehouse_spark.functions.jpeg import decode_jpeg, encode_jpeg

    jpeg = encode_jpeg(8, 8, bytes(range(64)))  # gray: tables (0,0)+(1,0)

    def tables(frame):
        out = set()
        for marker, start, length in _iter_jpeg_segments(frame):
            if marker == 0xC4:
                out |= _dht_tables_present(frame, start, length)
        return out

    assert tables(jpeg) == {(0, 0), (1, 0)}
    # drop ONLY the AC table -> partial set
    keep = []
    pos = 0
    for marker, start, length in _iter_jpeg_segments(jpeg):
        if marker == 0xC4 and _dht_tables_present(jpeg, start, length) == {(1, 0)}:
            keep.append(jpeg[pos:start])
            pos = start + length
        if marker == 0xDA:
            keep.append(jpeg[pos:])
    partial = b"".join(keep)
    assert tables(partial) == {(0, 0)}
    fixed = _ensure_dht(partial)
    # only the SOS-referenced missing table is spliced (gray scans
    # never reference the chroma tables), and the frame's own DC
    # table survives un-duplicated
    assert tables(fixed) == {(0, 0), (1, 0)}
    ids = []
    for marker, start, length in _iter_jpeg_segments(fixed):
        if marker == 0xC4:
            p, end = start + 4, start + length
            while p + 17 <= end:
                ids.append(fixed[p])
                p += 17 + sum(fixed[p + 1 : p + 17])
    assert sorted(ids) == [0x00, 0x10]
    assert decode_jpeg(fixed) == decode_jpeg(jpeg)

    # a COLOR partial frame pulls in the chroma tables it references
    rgbpx = bytes((i * 37) % 256 for i in range(8 * 8 * 3))
    cj = encode_jpeg(8, 8, rgbpx, color=True)
    assert tables(_ensure_dht(_strip_dht_local(cj))) >= {(0, 1), (1, 1)}


def _strip_dht_local(jpeg):
    from datalakehouse_spark.functions.avi import _strip_dht

    return _strip_dht(jpeg)


def test_sample_frames_decodes_mjpeg_assets(spark):
    """The distributed frame-fingerprint pass handles MJPEG AVIs with
    the same contract as BI_RGB ones — per-frame md5 over normalized
    RGB24, corrupt payloads contributing zero rows."""
    import hashlib

    from datalakehouse_spark.functions.avi import avi_iter_frames, encode_avi_mjpeg
    from datalakehouse_spark.functions.jpeg import encode_jpeg
    from datalakehouse_spark.operators.multimodal import sample_frames

    jpegs = [
        encode_jpeg(8, 8, bytes([v]) * 64) for v in (0, 64, 128, 192)
    ]
    payload = encode_avi_mjpeg(jpegs, 8, 8, fps=4, strip_dht=True)
    expected = {
        i: hashlib.md5(rgb).hexdigest() for i, rgb in avi_iter_frames(payload, 2)
    }
    assets = spark.createDataFrame(
        [(1, "video", payload), (2, "video", payload[:40])],
        "asset_id long, media_type string, payload binary",
    )
    out = sample_frames(assets, stride=2, fake=False).collect()
    assert {r.asset_id for r in out} == {1}
    assert {r.frame_idx: r.frame_md5 for r in out} == expected


def test_image_fingerprints_collapse_across_formats(spark):
    """Pixel-identical PNG/BMP/TIFF/GIF payloads fingerprint the same;
    a JPEG of different pixels stands alone; corrupt contributes zero
    rows."""
    from datalakehouse_spark.functions.bmp import encode_bmp
    from datalakehouse_spark.functions.gif import encode_gif
    from datalakehouse_spark.functions.jpeg import encode_jpeg
    from datalakehouse_spark.functions.png import encode_png
    from datalakehouse_spark.functions.tiff import encode_tiff
    from datalakehouse_spark.operators.multimodal import image_fingerprints

    gray = bytes(range(64))
    rgb = bytes(v for b in gray for v in (b, b, b))
    grays = [(i, i, i) for i in range(256)]
    assets = spark.createDataFrame(
        [
            (1, encode_png(16, 4, gray, color_type=0)),
            (2, encode_bmp(16, 4, rgb)),
            (3, encode_tiff(16, 4, gray)),
            (4, encode_gif(16, 4, gray, grays)),
            (5, encode_jpeg(8, 8, bytes([200]) * 64)),
            (6, b"corrupt \x00 bytes"),
        ],
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in image_fingerprints(assets).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # corrupt dropped
    fps = {rows[i].pixel_md5 for i in (1, 2, 3, 4)}
    assert len(fps) == 1, "lossless formats of the same pixels must collapse"
    assert rows[5].pixel_md5 not in fps
    assert all((rows[i].width, rows[i].height) == (16, 4) for i in (1, 2, 3, 4))


def test_wav_g711_and_adpcm_decode():
    """Round 13: G.711 mu/A-law segment expansion (spec endpoints) and
    the IMA ADPCM state machine decode through the real RIFF path."""
    import math

    import pytest as _pytest

    from datalakehouse_spark.functions.wav import (
        WavError,
        _ALAW_TABLE,
        _ULAW_TABLE,
        _ima_step,
        encode_wav_adpcm,
        encode_wav_g711,
        wav_pcm_samples,
        wav_pcm_stats,
    )
    from datalakehouse_spark.operators.multimodal import decode_audio

    # G.711 endpoints straight from the public tables
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x80] == 32124
    assert _ULAW_TABLE[0x00] == -32124
    assert _ALAW_TABLE[0xD5] == 8 and _ALAW_TABLE[0x55] == -8
    assert max(_ALAW_TABLE) == 32256 and min(_ALAW_TABLE) == -32256
    # sign symmetry: clearing the sign bit negates (mu-law: code^0x80)
    assert all(_ULAW_TABLE[c] == -_ULAW_TABLE[c ^ 0x80] for c in range(256))
    assert all(_ALAW_TABLE[c] == -_ALAW_TABLE[c ^ 0x80] for c in range(256))

    codes = bytes(range(256))
    rate, n_ch, vals = wav_pcm_samples(encode_wav_g711(codes, "ulaw"))
    assert (rate, n_ch) == (8000, 1) and vals == _ULAW_TABLE
    _, _, vals = wav_pcm_samples(encode_wav_g711(codes, "alaw"))
    assert vals == _ALAW_TABLE

    # ADPCM: RIFF decode == transition-function walk, header sample first
    nib = bytes([0x88, 0x31, 0x7F, 0x02, 0xF0, 0x19, 0xA5, 0x4C])
    _, _, got = wav_pcm_samples(
        encode_wav_adpcm(nib, predictor=-1234, step_index=17)
    )
    pred, idx = -1234, 17
    exp = [pred]
    for b in nib:
        for n in (b & 0x0F, b >> 4):
            pred, idx = _ima_step(n, pred, idx)
            exp.append(pred)
    assert got == exp and len(got) == 17

    # dispatch: RIFF magic routes the compressed tags through decode_audio
    drate, dch, dframes, ddur, drms, dpeak = decode_audio(
        encode_wav_g711(codes, "ulaw")
    )
    assert (drate, dch, dframes) == (8000, 1, 256)
    assert math.isclose(dpeak, 32124 / 32768.0)

    # loud rejections: bad law, ragged nibbles, out-of-range state
    with _pytest.raises(WavError, match="law"):
        encode_wav_g711(codes, "gsm")
    with _pytest.raises(WavError, match="4-byte words"):
        encode_wav_adpcm(b"\x00\x01\x02")
    with _pytest.raises(WavError, match="out of range"):
        encode_wav_adpcm(b"\x00" * 4, step_index=89)
    # a truncated-to-headerless block payload is loud too
    bad = bytearray(encode_wav_adpcm(b"\x00" * 4))
    import struct as _struct

    # mangle step index inside the data chunk header
    pos = bad.rindex(b"data") + 8 + 2
    bad[pos] = 90
    with _pytest.raises(WavError, match="step index"):
        wav_pcm_stats(bytes(bad))


def test_wav_adpcm_stereo_interleave():
    """Multi-channel IMA ADPCM: 4-byte data words round-robin across
    channels, each channel carries its own (pred, idx) state, output
    interleaves per sample instant — checked against an independent
    per-channel walk over a hand-built two-channel block."""
    import struct

    from datalakehouse_spark.functions.wav import (
        _ima_step,
        wav_pcm_samples,
    )

    n_ch, rate = 2, 8000
    headers = struct.pack("<hBB", 500, 10, 0) + struct.pack("<hBB", -700, 30, 0)
    words_l = bytes([0x12, 0x34, 0x56, 0x78])
    words_r = bytes([0x9A, 0xBC, 0xDE, 0xF0])
    block = headers + words_l + words_r
    align = len(block)
    spb = 1 + (len(block) - 4 * n_ch) * 2 // n_ch
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, n_ch, rate,
        (rate * align + spb - 1) // spb, align, 4, 2, spb,
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    r, ch, got = wav_pcm_samples(payload)
    assert (r, ch) == (rate, n_ch)

    chans = []
    for pred, idx, words in ((500, 10, words_l), (-700, 30, words_r)):
        vals = [pred]
        for b in words:
            for n in (b & 0x0F, b >> 4):
                pred, idx = _ima_step(n, pred, idx)
                vals.append(pred)
        chans.append(vals)
    exp = [chans[c][i] for i in range(len(chans[0])) for c in range(n_ch)]
    assert got == exp and len(got) == 2 * spb
