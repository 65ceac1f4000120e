"""Focused pins for the round-16 optimization changes to operator
internals — each test pins that an optimization changed HOW something is
computed, never WHAT it computes.

- near_dup_pairs now derives signatures from a materialized shingle
  frame: the factored (shingle_frame -> minhash_from_shingles) path must
  stay bit-identical to the fused minhash_signatures_df it was split from.
- _darray_lit/_darray2_lit build array literals via one F.expr parse
  instead of per-element F.lit py4j calls: parsed doubles must be
  bit-identical, including non-finite values.
- VersionedTable.merge_upsert derives touched partitions from the
  written files' manifest entries (write-first reorder): the one
  deliberate behavior nuance — a source that only touches NEW partitions
  is now coerced to the table schema like every other upsert — is pinned.
- operators.graph.pagerank chains iterations lazily with a checkpoint
  every _CKPT_EVERY rounds: the cadence must not change values.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_minhash_from_shingles_matches_fused(spark):
    from datalakehouse_spark.io import load_table
    from datalakehouse_spark.operators.dedup import (
        minhash_from_shingles,
        minhash_signatures_df,
        shingle_frame,
    )

    docs = load_table(spark, SF, "documents")
    fused = {tuple(r) for r in minhash_signatures_df(docs).collect()}
    sh = shingle_frame(docs).localCheckpoint(eager=True)
    factored = {tuple(r) for r in minhash_from_shingles(sh).collect()}
    assert fused == factored


def test_darray_lit_bit_identical(spark):
    from datalakehouse_spark.operators.similarity import (
        _darray2_lit,
        _darray_lit,
    )

    vals = [
        0.0,
        -0.0,
        1e-5,
        -3.2e300,
        0.1 + 0.2,
        123456789.123456789,
        5e-324,  # smallest subnormal
        float("inf"),
        float("-inf"),
    ]
    got = spark.range(1).select(_darray_lit(vals).alias("a")).first()["a"]
    assert len(got) == len(vals)
    for g, v in zip(got, vals):
        assert g == v and math.copysign(1.0, g) == math.copysign(1.0, v)
    # NaN round-trips as NaN (not NULL, not a cast error)
    gn = spark.range(1).select(_darray_lit([float("nan")]).alias("a")).first()["a"]
    assert len(gn) == 1 and math.isnan(gn[0])
    # the nested form and the F.lit form agree element-wise
    rows = [[0.5, -1.25e-7], [float(2**53 + 1), 3.0]]
    eq = (
        spark.range(1)
        .select(
            (_darray2_lit(rows) == F.lit([[float(x) for x in r] for r in rows])).alias(
                "eq"
            )
        )
        .first()["eq"]
    )
    assert eq is True


def test_merge_upsert_new_partition_only_coerces_to_table_schema(spark, tmp_path):
    """Round 16: touched partitions come from the written files' manifest
    entries, so the source is written BEFORE the touched set is known and
    is always coerced to the table schema — including an upsert that only
    creates NEW partitions (previously written raw).  Pin column order
    and values."""
    from datalakehouse_spark.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "t"), partition_by=["day"])
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0)], "id int, day string, v double"
    )
    t.create(base)
    want_cols = t.read().columns  # hive layout: partition col reads last
    # source with REORDERED columns touching only a brand-new partition
    src = spark.createDataFrame(
        [(20.0, 2, "2024-01-02")], "v double, id int, day string"
    ).select("v", "id", "day")
    t.merge_upsert(src, keys=["id", "day"])
    got = t.read()
    assert got.columns == want_cols  # table schema, not source order
    # hive partition discovery types `day` as DATE — compare as string
    rows = {
        tuple(r)
        for r in got.select("id", F.col("day").cast("string"), "v").collect()
    }
    assert rows == {(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0)}
    # untouched partition's file carried over, new partition added
    assert t.current_version() == 2


def test_merge_upsert_evaluates_source_once(spark, tmp_path):
    """The reorder exists to stop the MERGE from running its (arbitrary,
    possibly expensive) source plan twice.  Count evaluations with an
    accumulator-backed column."""
    from datalakehouse_spark.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "t2"), partition_by=["day"])
    t.create(
        spark.createDataFrame([(1, "2024-01-01", 1.0)], "id int, day string, v double")
    )
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    bump_udf = F.udf(bump, "int").asNondeterministic()
    src = spark.createDataFrame(
        [(1, "2024-01-01", 5.0)], "id int, day string, v double"
    ).withColumn("id", bump_udf("id"))
    t.merge_upsert(src, keys=["id", "day"])
    assert acc.value == 1, f"source evaluated {acc.value} times, expected 1"


def test_pagerank_checkpoint_cadence_matches_eager(spark, monkeypatch):
    """Values must be independent of WHERE the lazy chain is cut: run the
    same 6-iteration pagerank with the production cadence and with a
    checkpoint after every round; bit-identical ranks required."""
    import datalakehouse_spark.operators.graph as G

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )

    def run():
        return {
            (r["id"], r["rank"])
            for r in G.pagerank(nodes, pairs, id_col="id", iters=6).collect()
        }

    got = run()
    assert G._CKPT_EVERY == 4, "production cadence changed; re-check scale posture"
    # re-run with a checkpoint after EVERY round (ADVICE r16: the
    # cadence is a module constant now, monkeypatch it directly)
    monkeypatch.setattr(G, "_CKPT_EVERY", 1)
    want = run()
    assert got == want
