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
    import datalakehouse_spark.registry_ext6 as _e6

    def _clear_memos():
        _e1._QUERY_VEC_CACHE.clear()
        _e1._IVF_INDEX_CACHE.clear()
        _e1._COARSE_CACHE.clear()
        _e4._PQ_INDEX_CACHE.clear()
        _e4._IVFPQ_INDEX_CACHE.clear()
        _e6._BPE_CACHE.clear()
        _e6._ND_STAGE_CACHE.clear()
        # the bucketed-join entry memoizes through the session catalog
        # (tableExists) — drop its tables so the build is cold here too
        for t in spark.catalog.listTables():
            if t.name.startswith("bkt_"):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")

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
    assert lines[0].startswith(f"# {{'registry': {len(REGISTRY)}")
    body = [l.strip().strip('",') for l in lines if l.startswith('    "')]
    assert body[0] == "ntile_percent_rank"
    assert len(body) == len(set(body)), "rotation must not repeat entries"
    assert set(body) <= set(REGISTRY), "rotation must only name registered entries"


def test_driver_priority_is_the_reproducible_rotation():
    """The committed _DRIVER_PRIORITY must BE compute_rotation(changed,
    asof) for the committed provenance constants — a round that ships a
    hand-edited, reordered, or simply unrotated (stale last-round) list
    fails here instead of silently starving the driver window of the
    oldest-evidence entries (VERDICT r12 #7)."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from rotation_helper import compute_rotation

    from datalakehouse_spark.registry import (
        _DRIVER_ROTATION_ASOF,
        _DRIVER_ROTATION_CHANGED,
    )

    expected, summary = compute_rotation(
        list(_DRIVER_ROTATION_CHANGED), _DRIVER_ROTATION_ASOF
    )
    assert list(_DRIVER_PRIORITY) == expected, (
        "committed _DRIVER_PRIORITY diverges from the reproducible "
        f"rotation (first diff at index "
        f"{next(i for i, (a, b) in enumerate(zip(_DRIVER_PRIORITY, expected)) if a != b) if list(_DRIVER_PRIORITY) != expected and any(a != b for a, b in zip(_DRIVER_PRIORITY, expected)) else len(expected)}); "
        "re-run tools/rotation_helper.py and paste its full block"
    )
    # and it would have flagged an unrotated list: keeping last round's
    # head (the r12 changed entries) in front while this round's
    # changed-entry set differs is exactly the failure mode
    hypothetical_unrotated = ["bucketed_colocated_join", "zorder_key_accounting"]
    stale_head, _ = compute_rotation(hypothetical_unrotated, _DRIVER_ROTATION_ASOF)
    assert stale_head != expected


# ---------------------------------------------------------------------------
# Float64-cliff lint (round 12, VERDICT r11 #6).  DuckDB's `.df()`
# materializes EVERY integer (hugeint) and decimal SUM as float64 —
# exact below 2^53, silently rounded above it (probed: SUM(2^60+3)
# reads 1.152921504606847e+18).  The sf0.1 sweep caught this twice
# (r9 `max_concurrency`, r11 the DECIMAL(38) excision digest); this
# lint encodes the lesson statically: an oracle SUM whose per-row
# addend can be HUGE — a hex-to-integer digest idiom, or an explicit
# DECIMAL cast budgeting >= 17 integer digits (2^53 ~ 9.0e15 is 16) —
# must leave the query as a decimal-digit STRING (the
# `dup_span_excision_apply` pattern: CAST(SUM(...) AS VARCHAR), with
# the Spark side emitting .cast("decimal(38,0)").cast("string")) or
# via an EXPLICIT CAST ... AS DOUBLE (the dsum/davg convention: one
# deliberate, documented rounding both engines apply identically).
# Anything else materializes through float64 without the author ever
# having said "float" — bit-green at sf0.01, drifting at volume.
# ---------------------------------------------------------------------------

import re as _re

_HEX_IDIOMS = ("'0x'", "from_hex(", "unhex(")
# BIGINT is safe-by-loudness: duckdb materializes int64 exactly and
# ERRORS on overflow instead of rounding silently.
_SAFE_FINAL = ("VARCHAR", "TEXT", "STRING", "DOUBLE", "FLOAT8", "REAL", "BIGINT", "INT8")


def _sum_calls(sql: str):
    """Yield (call_text, final_cast_type) for each SUM(...) in sql,
    following the chain of DIRECTLY-enclosing CASTs to the type the
    aggregate ultimately materializes as (None = bare: DuckDB picks
    hugeint/decimal and .df() renders float64)."""
    for m in _re.finditer(r"\bSUM\s*\(", sql, _re.I):
        i, depth = m.end(), 1
        while depth and i < len(sql):
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
        call = sql[m.start():i]
        final = None
        s, e = m.start(), i
        while True:  # walk outward through directly-wrapping CASTs
            pre = sql[max(0, s - 40):s]
            wrap = _re.search(r"CAST\s*\(\s*$", pre, _re.I)
            # consume parenthesized type args (DECIMAL(38,0)) so the
            # walk can continue to an outer CAST ... AS VARCHAR
            post = _re.match(
                r"\s*AS\s+([A-Za-z0-9_]+)(\s*\(\s*\d+\s*(?:,\s*\d+)?\s*\))?\s*\)",
                sql[e:],
            )
            if not (wrap and post):
                break
            final = post.group(1).upper()
            s = s - (len(pre) - wrap.start())
            e = e + post.end()
        yield call, final


def test_oracle_sums_avoid_float64_cliff():
    flagged = []
    for name, spec in REGISTRY.items():
        if spec.sql is None:
            continue
        for call, final in _sum_calls(spec.sql):
            low = call.lower()
            huge = any(h in low for h in _HEX_IDIOMS)
            for p, sc in _re.findall(r"DECIMAL\s*\(\s*(\d+)\s*(?:,\s*(\d+))?", call, _re.I):
                if int(p) - int(sc or 0) >= 17:
                    huge = True
            if huge and (final or "") not in _SAFE_FINAL:
                flagged.append((name, final, call[:90]))
    assert not flagged, (
        "oracle SUM(s) with huge addends must be emitted as a decimal-"
        "digit STRING (CAST(SUM(...) AS VARCHAR); Spark: .cast('decimal"
        "(38,0)').cast('string') — see dup_span_excision_apply / "
        "registry_ext6.py) or an explicit CAST AS DOUBLE: "
        f"{flagged}"
    )


def test_float64_cliff_lint_catches_the_r11_shape():
    """The lint must flag the exact pre-fix r11 digest shape (decimal-
    typed SUM of a hex digest, no string emission) and pass the fixed
    one — otherwise it lints nothing."""
    bad = "SELECT CAST(SUM(CAST(('0x' || substr(dmd5,1,15)) AS BIGINT)) AS DECIMAL(38,0)) AS d FROM t"
    bare = "SELECT SUM(CAST(x AS DECIMAL(38,0))) AS d FROM t"
    good = ("SELECT CAST(CAST(SUM(CAST(('0x' || substr(dmd5,1,15)) AS BIGINT)) "
            "AS DECIMAL(38,0)) AS VARCHAR) AS d FROM t")
    dsum_style = "SELECT CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS s FROM t"

    def finals(sql):
        return [(f, any(h in c.lower() for h in _HEX_IDIOMS)) for c, f in _sum_calls(sql)]

    assert finals(bad) == [("DECIMAL", True)]
    assert finals(bare) == [(None, False)]
    assert finals(good) == [("VARCHAR", True)]
    assert finals(dsum_style) == [("DOUBLE", False)]
