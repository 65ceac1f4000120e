"""The local twin of the driver's correctness gate: every SQL-expressible
registry query must hash-match its DuckDB oracle on the fixtures."""

import pytest

from datalakehouse_spark.oracle_check import compare_query
from datalakehouse_spark.registry import REGISTRY, _load_extensions

_load_extensions()

SQL_QUERIES = [(n, s) for n, s in REGISTRY.items() if s.sql is not None]


@pytest.mark.parametrize("name,spec", SQL_QUERIES, ids=[n for n, _ in SQL_QUERIES])
def test_oracle_match(spark, sf_small, name, spec):
    res = compare_query(spark, sf_small, name, spec.fn, spec.sql)
    assert res.ok, (
        f"{name}: rows {res.spark_rows}/{res.oracle_rows} "
        f"schema_match={res.schema_match} value_match={res.value_match} {res.detail}"
    )


# ---------------------------------------------------------------------------
# sf0.1 spot-sweep (opt-in): scale-sensitive entry classes
# ---------------------------------------------------------------------------
#
# The driver only ever compares at sf0.01; failure classes that are a
# FUNCTION of data volume — decimal staging overflowing its precision
# on 10x larger sums, percentile/sketch drift, rank arithmetic at 10x
# rows, dedup digest collisions — have no oracle coverage there.
# SPARK_GRAFT_SF01_SWEEP=1 runs the curated scale-sensitive class
# representatives bit-exact at sf0.1 (~45 s);
# SPARK_GRAFT_SF01_SWEEP=all sweeps EVERY SQL-expressible registry
# entry at sf0.1 (~6-8 min) — volume-stability insurance for the
# classes no one predicted.  Both are opt-in: for the round's
# verification pass, not the inner loop.

import os as _os

SF_LARGE = "/root/testdata/sf0.1"

_SCALE_SENSITIVE = [
    # decimal-sum TPC-H aggregates (precision headroom under 10x sums)
    "q1_pricing_summary",
    "q18_large_orders",
    "monthly_revenue",
    "revenue_reconciliation",
    # sketch / percentile (merge paths see more partials at 10x)
    "kmv_distinct_sketch",
    "kmv_rolling_distinct",
    "exact_percentiles",
    "weighted_median",
    "approx_stats",
    "stats_moments",
    "value_stats_exact",
    # global-rank arithmetic (bucket offsets at 10x rows)
    "ntile_percent_rank",
    "gini_coefficient",
    "ltv_deciles_pareto",
    # dedup basics (digest grouping at 10x corpus)
    "dedup_exact",
    "dedup_exact_normalized",
    "minhash_signatures",
    "doc_fingerprints",
    "chunk_dedup_stats",
    "decontamination_report",
    # round-8 additions (semantic + incremental ingest dedup)
    "semantic_dedup",
    "incremental_dedup_ingest",
    "ingest_drift_psi",
    "embedding_drift",
]

_SWEEP_MODE = _os.environ.get("SPARK_GRAFT_SF01_SWEEP", "")
if _SWEEP_MODE == "all":
    _SF01_CASES = SQL_QUERIES
else:
    _SF01_CASES = [(n, REGISTRY[n]) for n in _SCALE_SENSITIVE if REGISTRY[n].sql]


@pytest.mark.skipif(
    _SWEEP_MODE not in ("1", "all"),
    reason="opt-in 10x-fixture sweep: set SPARK_GRAFT_SF01_SWEEP=1 (classes) or =all",
)
@pytest.mark.parametrize("name,spec", _SF01_CASES, ids=[n for n, _ in _SF01_CASES])
def test_oracle_match_sf01(spark, name, spec):
    res = compare_query(spark, SF_LARGE, name, spec.fn, spec.sql)
    assert res.ok, (
        f"{name} at sf0.1: rows {res.spark_rows}/{res.oracle_rows} "
        f"schema_match={res.schema_match} value_match={res.value_match} {res.detail}"
    )
