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


def test_non_png_without_pillow_is_explicitly_stubbed():
    """Honest-probe contract: only the PNG path is stdlib-decodable;
    other image formats still need Pillow and must say so."""
    from datalakehouse_spark.operators.multimodal import decode_image, pil_available

    if pil_available():
        pytest.skip("Pillow present: every format it reads lights up instead")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish bytes")


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
