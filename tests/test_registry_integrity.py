"""Registry hygiene: the driver consumes `queries()`/`oracle_sql()`
blind, so structural mistakes (a typo'd priority name, a duplicate
registration, an oracle DuckDB can't even parse) must fail fast here
rather than as a silent driver red."""

import duckdb
import pytest

from datalakehouse_spark.registry import (
    REGISTRY,
    _DRIVER_PRIORITY,
    _load_extensions,
)

_load_extensions()


def test_driver_priority_names_all_registered():
    missing = [n for n in _DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"priority names not in registry: {missing}"


def test_driver_priority_has_no_duplicates():
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY))


def test_every_entry_has_description():
    empty = [n for n, s in REGISTRY.items() if not (s.doc or "").strip()]
    assert not empty


@pytest.mark.parametrize(
    "name", [n for n, s in REGISTRY.items() if s.sql is not None]
)
def test_oracle_sql_parses_in_duckdb(name):
    """Catch SQL-dialect typos without running anything: DuckDB must at
    least PLAN every oracle against empty tables of the fixture schema."""
    con = duckdb.connect()
    for t, cols in {
        "region": "r_regionkey INT, r_name VARCHAR",
        "nation": "n_nationkey INT, n_name VARCHAR, n_regionkey INT",
        "customer": "c_custkey BIGINT, c_name VARCHAR, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment VARCHAR",
        "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT, "
        "s_acctbal DOUBLE",
        "part": "p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, "
        "p_type VARCHAR, p_size INT, p_retailprice DOUBLE",
        "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR",
        "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, "
        "l_linestatus VARCHAR, l_shipdate TIMESTAMP",
        "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR",
        "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT",
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
    }.items():
        con.execute(f"CREATE TABLE {t} ({cols})")
    sql = REGISTRY[name].sql
    # EXPLAIN = parse + bind + plan, no execution (some oracles touch
    # temp paths at run time; planning is the structural check we want)
    con.execute(f"EXPLAIN {sql}")
    con.close()


def test_eager_build_class_is_exact(spark):
    """The lazy-build contract, pinned BOTH ways with a job-group scan:
    no entry outside registry.EAGER_BUILD_ENTRIES may run a Spark job at
    build time (an eager collect/count/write sneaking into a query entry
    is a driver-side scale bug), and every listed entry must actually be
    eager (else the listing is stale).  Tables are pre-warmed first so
    load_table's one-off schema-sniff job isn't attributed to the first
    entry touching each table."""
    from datalakehouse_spark.io import load_table
    from datalakehouse_spark.registry import EAGER_BUILD_ENTRIES

    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        load_table(spark, sf, t)
    # clear the process-level ANN build memos before EVERY entry: the
    # pinned contract is cold-session build behavior — with a single
    # up-front clear, whichever memoized entry runs first warms the
    # cache for its siblings (e.g. semantic_dedup sharing the IVF
    # coarse build) and the sweep would misread them as lazy
    import datalakehouse_spark.registry_ext as _e1
    import datalakehouse_spark.registry_ext4 as _e4

    def _clear_memos():
        _e1._QUERY_VEC_CACHE.clear()
        _e1._IVF_INDEX_CACHE.clear()
        _e1._COARSE_CACHE.clear()
        _e4._PQ_INDEX_CACHE.clear()
        _e4._IVFPQ_INDEX_CACHE.clear()

    sc = spark.sparkContext
    observed = set()
    for name, spec in REGISTRY.items():
        _clear_memos()
        group = f"eagercheck-{name}"
        sc.setJobGroup(group, name)
        try:
            spec.fn(spark, sf)
            if sc.statusTracker().getJobIdsForGroup(group):
                observed.add(name)
        finally:
            sc.setJobGroup("", "")
    assert observed - EAGER_BUILD_ENTRIES == set(), (
        "entries running Spark jobs at build time without being in the "
        f"documented eager class: {sorted(observed - EAGER_BUILD_ENTRIES)}"
    )
    assert EAGER_BUILD_ENTRIES - observed == set(), (
        "stale eager-class listings (no longer run build-time jobs): "
        f"{sorted(EAGER_BUILD_ENTRIES - observed)}"
    )


def test_rotation_helper_partitions_registry():
    """The rotation tool must classify every entry exactly once and put
    the caller's changed entries first."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "tools/rotation_helper.py", "ntile_percent_rank"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.splitlines()
    assert lines[0].startswith(f"# registry={len(REGISTRY)}")
    body = [l.strip().strip('",') for l in lines if l.startswith('    "')]
    assert body[0] == "ntile_percent_rank"
    assert len(body) == len(set(body)), "rotation must not repeat entries"
    assert set(body) <= set(REGISTRY), "rotation must only name registered entries"
