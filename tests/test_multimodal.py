"""Multimodal binary-column plumbing (stubbed decode kernels)."""

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


def test_real_decode_is_explicitly_stubbed(spark, sf_small):
    from datalakehouse_spark.operators.multimodal import pil_available

    if pil_available():
        pytest.skip("Pillow present: the real kernel lights up instead")
    docs = load_table(spark, sf_small, "documents")
    assets = synthesize_assets_from_documents(docs, n=5)
    with pytest.raises(NotImplementedError):
        extract_features(assets, fake=False)
    from datalakehouse_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image")


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
