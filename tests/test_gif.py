"""GIF decoder (functions/gif.py, round 11).

Coverage: writer->decoder exact round trips (palette luma), interlace
reordering, transparency compositing onto the background, animated
frame counting, the LZW KwKwK case against a hand-built stream,
malformed rejection, real-world libxslt-doc GIFs (genuine LZW with
dictionary growth), and the decode_image dispatch."""

import os
import random

import pytest

from datalakehouse_spark.functions.gif import (
    GifError,
    _lzw_decode,
    decode_gif,
    encode_gif,
    gif_descriptor_offset,
    gif_luma_stats,
)


def _luma(r, g, b):
    return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16


_PAL = [(i, 255 - i, (i * 7) % 256) for i in range(0, 256, 8)]  # 32 colors


def test_roundtrip_exact_palette_luma():
    rng = random.Random(5)
    w, h = 13, 9
    idx = bytes(rng.randrange(len(_PAL)) for _ in range(w * h))
    gw, gh, luma, n = decode_gif(encode_gif(w, h, idx, _PAL))
    assert (gw, gh, n) == (w, h, 1)
    assert luma == bytes(_luma(*_PAL[i]) for i in idx)


def test_mean_matches_byte_math():
    idx = bytes([0, 1, 2, 3])
    pal = [(0, 0, 0), (255, 255, 255), (10, 20, 30), (200, 100, 50)]
    w, h, mean = gif_luma_stats(encode_gif(2, 2, idx, pal))
    assert (w, h) == (2, 2)
    assert mean == sum(_luma(*pal[i]) for i in idx) / (255.0 * 4)


def test_interlaced_frame_reordered():
    """Store rows in the 4-pass interlace order and set the interlace
    flag — decode must restore raster order."""
    pal = [(v, v, v) for v in range(0, 256, 32)]
    w, h = 4, 8
    raster = bytes(sum(([r] * w for r in range(h)), []))
    # rows in pass order for height 8: 0, 4, 2, 6, 1, 3, 5, 7
    pass_rows = [0, 4, 2, 6, 1, 3, 5, 7]
    permuted = bytes(sum(([r] * w for r in pass_rows), []))
    d = bytearray(encode_gif(w, h, permuted, pal))
    desc_at = gif_descriptor_offset(pal)
    d[desc_at + 9] |= 0x40  # interlace flag
    _, _, luma, _ = decode_gif(bytes(d))
    assert luma == bytes(
        _luma(*pal[i]) for i in raster
    ), "interlace rows not restored to raster order"


def test_transparency_composites_background():
    pal = [(255, 255, 255), (0, 0, 0)]
    idx = bytes([1, 0, 1, 0])
    base = encode_gif(2, 2, idx, pal)
    # inject a GCE declaring index 1 transparent; background = index 0
    gce = b"\x21\xf9\x04\x01\x00\x00\x01\x00"
    desc_at = gif_descriptor_offset(pal)
    with_gce = base[:desc_at] + gce + base[desc_at:]
    _, _, luma, _ = decode_gif(with_gce)
    assert luma == bytes([255, 255, 255, 255])  # transparent -> white bg


def test_animated_frames_counted_not_decoded():
    pal = [(9, 9, 9), (250, 250, 250)]
    f1 = encode_gif(3, 3, bytes([0] * 9), pal)
    f2 = encode_gif(3, 3, bytes([1] * 9), pal)
    animated = f1[:-1] + f2[gif_descriptor_offset(pal):]
    w, h, luma, n = decode_gif(animated)
    assert (w, h, n) == (3, 3, 2)
    assert set(luma) == {_luma(9, 9, 9)}  # first frame only


def test_lzw_kwkwk_case():
    """The code-equals-next-table-entry case: literal 0, then code 4
    (== next index) must emit prev + prev[0]."""
    # min code size 2: literals 0..3, clear=4, end=5, first dynamic=6
    codes = [(4, 3), (0, 3), (6, 3), (5, 3)]  # CLEAR, 0, KwKwK, END
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert bytes(_lzw_decode(2, bytes(out), 3)) == b"\x00\x00\x00"


def test_malformed_rejection():
    good = encode_gif(2, 2, bytes(4), [(1, 2, 3)])
    with pytest.raises(GifError):
        decode_gif(b"")
    with pytest.raises(GifError):
        decode_gif(b"GIF89x" + good[6:])
    with pytest.raises(GifError):
        decode_gif(good[:-6])  # truncated sub-block chain
    with pytest.raises(GifError):
        decode_gif(good[:-1])  # missing trailer
    with pytest.raises(GifError):
        encode_gif(2, 2, bytes(3), [(0, 0, 0)])  # wrong buffer size
    with pytest.raises(GifError):
        encode_gif(1, 1, b"\x05", [(0, 0, 0)])  # index outside palette


_XSLT_DOCS = "/usr/share/doc/libxslt1-dev/html"


@pytest.mark.skipif(
    not os.path.isdir(_XSLT_DOCS), reason="libxslt doc GIFs absent"
)
def test_decodes_real_gifs_with_lzw_dictionary_growth():
    """Interop against real encoder output (genuine variable-width LZW
    with dictionary growth and code-width bumps — nothing our
    clear-per-literal fixture writer produces).  Dimensions are
    objective facts of the files; means are regression pins."""
    expected = {
        "redhat.gif": (44, 41, 0.2975),
        "smallfootonly.gif": (48, 60, 0.7447),
        "node.gif": (460, 497, 0.9453),
        "Libxslt-Logo-90x34.gif": (90, 34, 0.6453),
    }
    for name, (ew, eh, emean) in expected.items():
        path = os.path.join(_XSLT_DOCS, name)
        with open(path, "rb") as fh:
            w, h, mean = gif_luma_stats(fh.read())
        assert (w, h) == (ew, eh), name
        assert abs(mean - emean) < 0.002, (name, mean)


def test_decode_image_dispatches_gif():
    from datalakehouse_spark.operators.multimodal import (
        decode_image,
        pil_available,
    )

    if pil_available():
        pytest.skip("Pillow present: dispatch not reachable")
    pal = [(0, 0, 0), (255, 255, 255)]
    payload = encode_gif(4, 1, bytes([0, 1, 0, 1]), pal)
    w, h, mean = decode_image(payload)
    assert (w, h) == (4, 1) and mean == 0.5
    with pytest.raises(GifError):
        decode_image(payload[:-4])


# -- round 13: animated GIFs (disposal/transparency state machine) ---------


def test_gif_animation_compositing_state_machine():
    """Three-frame animation: transparency keeps underlying pixels,
    disposal 2 restores the frame rect to background before the next
    frame, disposal 3 restores the pre-frame canvas; gif_video_stats
    sums graphic-control delays without pixel decode."""
    from datalakehouse_spark.functions.gif import (
        decode_gif,
        encode_gif_animation,
        gif_iter_frames,
        gif_video_stats,
    )

    grays = [(i, i, i) for i in range(256)]
    W, H = 8, 4
    base = bytes(range(32, 32 + W * H))
    patch1 = bytes(range(64, 72))
    patch2 = bytes([100, 101, 102, 103])
    payload = encode_gif_animation(
        W, H,
        [
            dict(indices=base, disposal=1, delay_cs=10),
            dict(indices=patch1, left=2, top=1, width=4, height=2,
                 disposal=2, transparent=64, delay_cs=20),
            dict(indices=patch2, left=5, top=0, width=2, height=2,
                 delay_cs=30),
        ],
        grays, bg_index=95,
    )

    frames = list(gif_iter_frames(payload))
    assert [i for i, _ in frames] == [0, 1, 2]
    p0 = list(base)
    p1 = list(p0)
    for y in range(2):
        for x in range(4):
            v = patch1[y * 4 + x]
            if v != 64:  # transparent index
                p1[(1 + y) * W + 2 + x] = v
    p2 = list(p1)
    for y in range(2):
        for x in range(4):
            p2[(1 + y) * W + 2 + x] = 95  # disposal 2 -> background
    for y in range(2):
        for x in range(2):
            p2[y * W + 5 + x] = patch2[y * 2 + x]
    for k, exp in enumerate((p0, p1, p2)):
        rgb = frames[k][1]
        assert all(
            rgb[3 * i] == rgb[3 * i + 1] == rgb[3 * i + 2] == exp[i]
            for i in range(W * H)
        ), k

    w, h, n, fps, dur = gif_video_stats(payload)
    assert (w, h, n, dur) == (W, H, 3, 600.0)
    assert fps == 5.0
    assert decode_gif(payload)[3] == 3  # structural count unchanged
    assert [i for i, _ in gif_iter_frames(payload, stride=2)] == [0, 2]

    # disposal 3: restore-previous wipes the middle frame's patch
    payload3 = encode_gif_animation(
        W, H,
        [
            dict(indices=base, disposal=1),
            dict(indices=patch2, left=5, top=0, width=2, height=2,
                 disposal=3),
            dict(indices=bytes([40] * 4), left=0, top=0, width=2, height=2),
        ],
        grays,
    )
    last = list(gif_iter_frames(payload3))[2][1]
    exp3 = list(base)
    exp3[0] = exp3[1] = exp3[W] = exp3[W + 1] = 40
    assert [last[3 * i] for i in range(W * H)] == exp3


def test_gif_animation_through_sample_frames(spark):
    """The real operator path: a GIF animation fans out to one row per
    composited frame; an AVI of the same pixels fingerprints
    identically (cross-container frame dedup)."""
    import hashlib

    from datalakehouse_spark.functions.avi import encode_avi
    from datalakehouse_spark.functions.gif import (
        encode_gif_animation,
        gif_iter_frames,
    )
    from datalakehouse_spark.operators.multimodal import sample_frames

    grays = [(i, i, i) for i in range(256)]
    f0 = bytes(range(40, 56))
    f1 = bytes(range(60, 76))
    gif = encode_gif_animation(
        4, 4,
        [dict(indices=f0, disposal=1), dict(indices=f1)],
        grays,
    )
    avi = encode_avi(
        [bytes(v for b in f for v in (b, b, b)) for f in (f0, f1)], 4, 4,
        fps=10,
    )
    assets = spark.createDataFrame(
        [(1, "video", gif), (2, "video", avi), (3, "video", b"junk")],
        "asset_id long, media_type string, payload binary",
    )
    rows = sample_frames(assets, stride=1, fake=False).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, {})[r.frame_idx] = r.frame_md5
    assert set(by_asset) == {1, 2}  # junk contributes zero rows
    assert by_asset[1] == by_asset[2]  # same pixels, two containers
    exp = {
        i: hashlib.md5(rgb).hexdigest() for i, rgb in gif_iter_frames(gif)
    }
    assert by_asset[1] == exp
