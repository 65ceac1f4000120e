"""Round-12 container-metadata kernels: Matroska/WebM (EBML), Ogg
Vorbis/Opus, FLAC STREAMINFO — real metadata walks in pure stdlib,
loud errors for malformed input (the corrupt->zero-row degradation
path upstream), fixture writers that round-trip exactly."""

import struct

import pytest


def test_mkv_stub_roundtrip_and_fps_math():
    from datalakehouse_spark.functions.mkv import encode_mkv_stub, mkv_video_stats

    for n in (0, 1, 5, 30):
        for webm in (False, True):
            p = encode_mkv_stub(640, 360, n, fps=25.0, webm=webm)
            w, h, fps, nf, dur = mkv_video_stats(p)
            assert (w, h, nf) == (640, 360, n)
            assert fps == pytest.approx(25.0)
            assert dur == pytest.approx(n * 40.0)


def test_mkv_lacing_counts_packed_frames():
    """A laced SimpleBlock carries multiple frames — counting blocks
    instead of frames undercounts real-world files."""
    from datalakehouse_spark.functions.mkv import encode_mkv_stub, mkv_video_stats

    p = encode_mkv_stub(64, 48, 7, fps=10.0, laced_pairs=True)
    w, h, fps, nf, dur = mkv_video_stats(p)
    assert nf == 7 and fps == pytest.approx(10.0) and dur == pytest.approx(700.0)


def test_mkv_unknown_size_segment_streams_to_end():
    """Streamed writers emit the Segment with the all-ones unknown-size
    vint (RFC 8794); the walk must extend it to end of file."""
    from datalakehouse_spark.functions.mkv import (
        _read_vint,
        encode_mkv_stub,
        mkv_video_stats,
    )

    p = encode_mkv_stub(320, 240, 3, fps=50.0)
    seg_at = p.find(b"\x18\x53\x80\x67")
    _, after_size, _ = _read_vint(p, seg_at + 4, keep_marker=False)
    streamed = p[: seg_at + 4] + b"\xff" + p[after_size:]
    w, h, fps, nf, _ = mkv_video_stats(streamed)
    assert (w, h, nf) == (320, 240, 3) and fps == pytest.approx(50.0)


def test_mkv_clusters_before_tracks_still_count():
    """ADVICE r12: live/streamed Matroska may emit Clusters BEFORE the
    Tracks element; frame counting must not depend on walk order."""
    from datalakehouse_spark.functions.mkv import (
        _CLUSTER,
        _SEGMENT,
        _TRACKS,
        encode_mkv_stub,
        mkv_video_stats,
    )

    p = encode_mkv_stub(320, 240, 5, fps=25.0)
    assert mkv_video_stats(p)[3] == 5
    # surgically reorder the Segment's children: Info, Cluster, Tracks
    seg_id = _SEGMENT.to_bytes(4, "big")
    seg_at = p.find(seg_id)
    tracks_at = p.find(_TRACKS.to_bytes(4, "big"), seg_at)
    cluster_at = p.find(_CLUSTER.to_bytes(4, "big"), seg_at)
    assert seg_at < tracks_at < cluster_at
    reordered = (
        p[:tracks_at] + p[cluster_at:] + p[tracks_at:cluster_at]
    )
    w, h, fps, nf, dur = mkv_video_stats(reordered)
    assert (w, h, nf) == (320, 240, 5)
    assert fps == pytest.approx(25.0) and dur == pytest.approx(200.0)


def test_mkv_errors_are_loud():
    from datalakehouse_spark.functions.mkv import (
        MkvError,
        _SEGMENT,
        _TRACK_ENTRY,
        _TRACK_NUMBER,
        _TRACK_TYPE,
        _TRACKS,
        _elem,
        _elem_uint,
        encode_mkv_stub,
        mkv_video_stats,
    )

    for bad in (b"", b"\x1a\x45\xdf", b"nonsense", b"\x1a\x45\xdf\xa3"):
        with pytest.raises(MkvError):
            mkv_video_stats(bad)
    # audio-only: decodable container, nothing to report
    full = encode_mkv_stub(1, 1, 0)
    hdr = full[: full.find(b"\x18\x53\x80\x67")]
    audio_only = hdr + _elem(
        _SEGMENT,
        _elem(
            _TRACKS,
            _elem(
                _TRACK_ENTRY,
                _elem_uint(_TRACK_NUMBER, 1) + _elem_uint(_TRACK_TYPE, 2),
            ),
        ),
    )
    with pytest.raises(MkvError, match="no video track"):
        mkv_video_stats(audio_only)


def test_ogg_vorbis_and_opus_stats():
    from datalakehouse_spark.functions.ogg import encode_ogg_stub, ogg_audio_stats

    for n in (0, 1, 12345, 480000):
        r, ch, ns, dur = ogg_audio_stats(encode_ogg_stub(n, 8000, 2))
        assert (r, ch, ns) == (8000, 2, n)
        assert dur == pytest.approx(n * 1000.0 / 8000)
    # Opus granules tick at 48 kHz and include the pre-skip
    for n in (0, 960, 48000):
        r, ch, ns, dur = ogg_audio_stats(encode_ogg_stub(n, 48000, 1, opus=True))
        assert (r, ch, ns) == (48000, 1, n)
        assert dur == pytest.approx(n / 48.0)


def test_ogg_page_checksums_are_real():
    """The fixture writer emits REAL Ogg CRCs (poly 0x04C11DB7,
    unreflected) — the stream would survive a strict reader."""
    from datalakehouse_spark.functions.ogg import _ogg_crc, encode_ogg_stub

    p = encode_ogg_stub(100, 8000, 1)
    pos = 0
    pages = 0
    while pos < len(p):
        nsegs = p[pos + 26]
        body_len = sum(p[pos + 27 : pos + 27 + nsegs])
        end = pos + 27 + nsegs + body_len
        page = p[pos:end]
        (stored,) = struct.unpack("<I", page[22:26])
        assert _ogg_crc(page[:22] + b"\x00\x00\x00\x00" + page[26:]) == stored
        pos = end
        pages += 1
    assert pages == 2


def test_ogg_errors_are_loud():
    from datalakehouse_spark.functions.ogg import OggError, encode_ogg_stub, ogg_audio_stats

    for bad in (b"", b"OggS", b"not ogg", encode_ogg_stub(5)[:30]):
        with pytest.raises(OggError):
            ogg_audio_stats(bad)


def test_flac_streaminfo_bitfield():
    from datalakehouse_spark.functions.flac import encode_flac_stub, flac_audio_stats

    for n in (0, 1, 44100, (1 << 36) - 1):
        for rate, ch, bps in ((16000, 1, 16), (44100, 2, 24), (96000, 8, 32)):
            r, c, ns, dur = flac_audio_stats(encode_flac_stub(n, rate, ch, bps))
            assert (r, c, ns) == (rate, ch, n)
            assert dur == pytest.approx(n * 1000.0 / rate)


def test_flac_errors_are_loud():
    from datalakehouse_spark.functions.flac import FlacError, flac_audio_stats

    for bad in (b"", b"fLaC", b"fLaC\x00\x00\x00\x22" + b"\x00" * 10, b"junk"):
        with pytest.raises(FlacError):
            flac_audio_stats(bad)


def test_video_and_audio_feature_passes_dispatch_new_containers(spark):
    """extract_video_features routes MKV, extract_audio_features routes
    Ogg/FLAC — real metadata with the NaN-signal metadata-pass
    contract, corrupt payloads degrading per house rules."""
    import math

    from datalakehouse_spark.functions.flac import encode_flac_stub
    from datalakehouse_spark.functions.mkv import encode_mkv_stub
    from datalakehouse_spark.functions.ogg import encode_ogg_stub
    from datalakehouse_spark.operators.multimodal import (
        extract_audio_features,
        extract_video_features,
    )

    vids = spark.createDataFrame(
        [
            (1, "video", encode_mkv_stub(1280, 720, 48, fps=24.0)),
            (2, "video", b"\x1a\x45\xdf\xa3 corrupt ebml"),
        ],
        "asset_id long, media_type string, payload binary",
    )
    vrows = {r.asset_id: r for r in extract_video_features(vids).collect()}
    assert (vrows[1].width, vrows[1].height, vrows[1].n_frames) == (1280, 720, 48)
    assert vrows[1].fps == pytest.approx(24.0)
    assert vrows[1].duration_ms == pytest.approx(2000.0)
    assert vrows[2].n_frames == 0

    auds = spark.createDataFrame(
        [
            (1, "audio", encode_ogg_stub(16000, 16000, 1)),
            (2, "audio", encode_flac_stub(8000, 16000, 2)),
            (3, "audio", encode_ogg_stub(960, opus=True)),
        ],
        "asset_id long, media_type string, payload binary",
    )
    arows = {r.asset_id: r for r in extract_audio_features(auds).collect()}
    assert (arows[1].sample_rate, arows[1].n_frames) == (16000, 16000)
    assert arows[1].duration_ms == pytest.approx(1000.0)
    assert (arows[2].sample_rate, arows[2].n_channels, arows[2].n_frames) == (16000, 2, 8000)
    assert (arows[3].sample_rate, arows[3].n_frames) == (48000, 960)
    for r in arows.values():
        assert r.rms is None or math.isnan(r.rms)
