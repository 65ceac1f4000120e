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
