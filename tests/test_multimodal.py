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
    docs = load_table(spark, sf_small, "documents")
    assets = synthesize_assets_from_documents(docs, n=5)
    with pytest.raises(NotImplementedError):
        extract_features(assets, fake=False)
