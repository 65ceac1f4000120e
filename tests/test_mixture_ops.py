"""Invariants for the mixture operators (registry_ext6).

The DuckDB oracle sweep pins cross-engine bit-exactness; these tests
pin the SEMANTIC contract of the downsample plan — the properties a
training-data job relies on that a value-hash can't express.
"""

import math

from datalakehouse_spark.registry import REGISTRY, _load_extensions

_load_extensions()

_ALPHA = 0.7


def _rows(spark, sf):
    df = REGISTRY["mixture_downsample_plan"].fn(spark, sf)
    return {r["source"]: r.asDict() for r in df.collect()}


def test_downsample_anchor_keeps_everything(spark, sf_small):
    rows = _rows(spark, sf_small)
    anchors = [r for r in rows.values() if r["keep_rate"] == 1.0]
    assert len(anchors) == 1, "exactly one most-upsampled anchor source"
    a = anchors[0]
    assert a["n_docs_kept"] == a["n_docs"]
    assert a["kept_tokens"] == a["n_tokens"]


def test_downsample_rates_realize_the_mixture(spark, sf_small):
    """keep_rate_i == (r_i * tok_m) / (r_m * tok_i): after downsampling,
    expected token mass is proportional to tok^alpha — the smoothed
    mixture — and every rate stays in (0, 1]."""
    rows = _rows(spark, sf_small)
    m = min(rows.values(), key=lambda r: r["n_tokens"] / r["n_tokens"] ** _ALPHA)
    for r in rows.values():
        assert 0.0 < r["keep_rate"] <= 1.0
        expected = (r["n_tokens"] ** _ALPHA * m["n_tokens"]) / (
            m["n_tokens"] ** _ALPHA * r["n_tokens"]
        )
        assert math.isclose(r["keep_rate"], expected, rel_tol=1e-5)


def test_downsample_is_deterministic_and_close_to_target(spark, sf_small):
    first = _rows(spark, sf_small)
    second = _rows(spark, sf_small)
    assert first == second, "replayed plan must keep exactly the same docs"
    # achieved shares sum to 1 and track targets within small-sample noise
    assert math.isclose(sum(r["achieved_share"] for r in first.values()), 1.0, abs_tol=2e-5)
    for r in first.values():
        assert abs(r["achieved_share"] - r["target_weight"]) < 0.02
        assert r["n_docs_kept"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["n_tokens"]


def test_split_leakage_audit_accounting(spark, sf_small):
    from datalakehouse_spark.io import load_table

    rows = {r["split"]: r for r in REGISTRY["split_leakage_audit"].fn(spark, sf_small).collect()}
    n_docs = load_table(spark, sf_small, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    for r in rows.values():
        assert 0 <= r["n_leaked_exact"] <= r["n_docs"]
        assert 0 <= r["n_leaked_prefix"] <= r["n_docs"]
        assert r["prefix_leak_rate"] <= 1.0
    # each straddling prefix group has >= 2 docs spread over >= 2 splits,
    # so globally docs-in-groups >= 2x any one split's group count
    total_prefix_docs = sum(r["n_leaked_prefix"] for r in rows.values())
    max_groups = max(r["n_prefix_groups"] for r in rows.values())
    if max_groups:
        assert total_prefix_docs >= 2 * max_groups


def test_split_leakage_audits_the_dataset_split(spark, sf_small):
    """The audited assignment must be IDENTICAL to the one
    dataset_split_counts reports — same hash, same buckets — so the
    audit gates that entry's split rather than inventing a second one."""
    leak = {r["split"]: r["n_docs"] for r in REGISTRY["split_leakage_audit"].fn(spark, sf_small).collect()}
    counts = REGISTRY["dataset_split_counts"].fn(spark, sf_small).collect()
    per_split = {}
    for r in counts:
        per_split[r["split"]] = per_split.get(r["split"], 0) + r["n_docs"]
    assert leak == per_split


def test_excision_apply_matches_stats_accounting(spark, sf_small):
    """The APPLIED excision (cleaned corpus) must remove exactly the
    token mass the stats entry predicted: per source,
    tokens_before - tokens_after == excised_tokens, and
    tokens_before == n_tokens."""
    from datalakehouse_spark.registry_ext6 import (
        q_dup_span_excision_apply,
        q_dup_span_excision_stats,
    )

    stats = {
        r["source"]: r
        for r in q_dup_span_excision_stats(spark, sf_small).collect()
    }
    applied = {
        r["source"]: r
        for r in q_dup_span_excision_apply(spark, sf_small).collect()
    }
    assert set(stats) == set(applied) and stats
    for src, a in applied.items():
        s = stats[src]
        assert a["tokens_before"] == s["n_tokens"]
        assert a["tokens_before"] - a["tokens_after"] == s["excised_tokens"]
        assert a["n_docs"] == s["n_docs"]
