"""Property and equivalence tests for the round-5 analytics batch —
checks the oracle can't express (naive-form equivalence, mergeability,
blocking bounds, rerun determinism)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from datalakehouse_spark.io import load_table
from datalakehouse_spark.registry import REGISTRY, _load_extensions

_load_extensions()

SF = "/root/testdata/sf0.001"


def test_max_concurrency_matches_naive_global_window(spark, sf_small):
    """The two-phase (per-day partial + carry) prefix sum must equal
    the naive single-task ORDER-BY-time running sum."""
    ev = load_table(spark, SF, "events")
    s_us = F.unix_micros(F.col("ts"))
    e_us = s_us + (F.lit(60) + (F.col("value") * 10).cast("bigint")) * F.lit(1_000_000)
    iv = ev.select(s_us.alias("s_us"), e_us.alias("e_us"))
    deltas = iv.select(F.col("s_us").alias("t_us"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("e_us").alias("t_us"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy("t_us").agg(F.sum("d").alias("net"))
    w_global = Window.orderBy("t_us").rowsBetween(Window.unboundedPreceding, 0)
    naive = (
        per_t.select(
            F.to_date(F.timestamp_micros(F.col("t_us"))).alias("day"),
            F.sum("net").over(w_global).alias("live"),
        )
        .groupBy("day")
        .agg(F.max("live").alias("peak_concurrency"))
    )
    fast = REGISTRY["max_concurrency"].fn(spark, SF)
    n_rows = naive.count()
    assert n_rows > 0
    assert naive.join(fast, ["day", "peak_concurrency"]).count() == n_rows


def test_kmv_sketch_is_mergeable(spark, sf_small):
    """k-min of a union == k-min of the merged per-part k-min sets —
    the property that lets per-partition sketches roll up at O(k)."""
    from datalakehouse_spark.operators.dedup import md5_hash60

    ev = load_table(spark, SF, "events")
    k = 64
    hashes = ev.select(
        md5_hash60(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))).alias(
            "h"
        ),
        (F.col("event_id") % 2).alias("part"),
    ).distinct()
    full_kmin = [
        r["h"] for r in hashes.select("h").distinct().orderBy("h").limit(k).collect()
    ]
    per_part = [
        sorted(
            r["h"]
            for r in hashes.where(F.col("part") == p)
            .select("h")
            .distinct()
            .collect()
        )[:k]
        for p in (0, 1)
    ]
    merged = sorted(set(per_part[0]) | set(per_part[1]))[:k]
    assert merged == full_kmin


def test_kmv_estimate_tracks_exact(spark, sf_small):
    rows = REGISTRY["kmv_distinct_sketch"].fn(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        exact, est = r["exact_users"], r["kmv_estimate"]
        # k=64 KMV: relative standard error ~ 1/sqrt(k-2) ≈ 13%; allow 4σ
        assert est == pytest.approx(exact, rel=0.5), r


def test_fuzzy_blocking_bounds_block_size(spark, sf_small):
    """The 16-char prefix must keep every block at O(100) — the invariant
    that makes the pair join linear (the 14-char form measured 203 s)."""
    cust = load_table(spark, "/root/testdata/sf0.01", "customer")
    sizes = (
        cust.groupBy(F.substring("c_name", 1, 16).alias("bk"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert sizes <= 100


def test_rebalance_rates_clamped_and_deterministic(spark, sf_small):
    df = REGISTRY["distribution_rebalance"].fn(spark, "/root/testdata/sf0.01")
    rows1 = {r["source"]: r.asDict() for r in df.collect()}
    rows2 = {
        r["source"]: r.asDict()
        for r in REGISTRY["distribution_rebalance"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    }
    assert rows1 == rows2  # salted-hash variate => rerun-identical
    for r in rows1.values():
        assert 0.0 < r["keep_rate"] <= 1.0
        assert r["n_kept"] <= r["n_docs"]
    # at least one source must actually downsample and one must clamp
    assert any(r["keep_rate"] < 1.0 for r in rows1.values())
    assert any(r["keep_rate"] == 1.0 for r in rows1.values())


def test_hierarchy_rollup_root_totals(spark, sf_small):
    """The root (node 0) must see every event exactly once."""
    ev = load_table(spark, SF, "events")
    total = ev.count()
    out = {r["node"]: r for r in REGISTRY["hierarchy_rollup"].fn(spark, SF).collect()}
    assert out[0]["n_events"] == total


def test_debounce_partitions_events(spark, sf_small):
    out = REGISTRY["debounce_events"].fn(spark, SF).collect()
    assert out
    for r in out:
        assert r["n_kept"] + r["n_debounced"] == r["n_events"]
        assert r["n_kept"] >= 1


def test_skyline_survivors_are_mutually_non_dominated(spark, sf_small):
    rows = REGISTRY["skyline_2d"].fn(spark, "/root/testdata/sf0.01").collect()
    assert rows
    pts = [(r["acctbal"], r["n_orders"]) for r in rows]
    for i, (x1, y1) in enumerate(pts):
        for j, (x2, y2) in enumerate(pts):
            if i != j:
                dominated = x2 >= x1 and y2 >= y1 and (x2 > x1 or y2 > y1)
                assert not dominated, (pts[i], pts[j])


def test_triangle_count_matches_brute_force(spark, sf_small):
    from itertools import combinations

    from datalakehouse_spark.operators import dedup as D
    from datalakehouse_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    edges = {
        (r["id_a"], r["id_b"])
        for r in D.near_dup_pairs(docs).collect()
    }
    nodes = sorted({v for e in edges for v in e})
    brute = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    out = REGISTRY["triangle_count"].fn(spark, "/root/testdata/sf0.01").first()
    assert out["n_triangles"] == brute
    assert out["n_edges"] == len(edges)


def test_benford_probabilities_sum_to_one(spark, sf_small):
    rows = REGISTRY["benford_first_digit"].fn(spark, "/root/testdata/sf0.01").collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-3


def test_kmv_rolling_estimate_tracks_exact(spark, sf_small):
    rows = REGISTRY["kmv_rolling_distinct"].fn(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["kmv_estimate"] == pytest.approx(r["exact_users"], rel=0.5), r


def test_inertia_decreases_with_k(spark, sf_small):
    """More clusters can only reduce within-cluster SS (same seeded
    init family) — the elbow curve must be monotone here."""
    rows = sorted(
        REGISTRY["kmeans_inertia_sweep"].fn(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r["k"],
    )
    inertias = [r["inertia"] for r in rows]
    assert inertias == sorted(inertias, reverse=True), inertias


def test_association_rules_metrics_bounded(spark, sf_small):
    rows = REGISTRY["association_rules"].fn(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0


def test_trend_r2_bounded(spark, sf_small):
    for r in REGISTRY["trend_slopes"].fn(spark, "/root/testdata/sf0.01").collect():
        assert 0.0 <= r["r2"] <= 1.0 + 1e-9


def test_gini_in_unit_interval(spark, sf_small):
    g = REGISTRY["gini_coefficient"].fn(spark, "/root/testdata/sf0.01").first()["gini"]
    assert 0.0 <= g <= 1.0
