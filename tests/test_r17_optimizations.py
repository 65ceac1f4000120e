"""Pins for the round-17 optimization internals.

Each test pins the BIT-IDENTITY (or behavior contract) of a round-17
restructure, so a future edit that changes values — not just speed —
fails here before it reaches the oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _py_simhash(texts: dict[int, str], n_bits: int = 64) -> dict[int, int]:
    """Reference SimHash recomputed independently in Python with the
    exact md5-slice hash the operator defines (module doc of
    operators/dedup.py)."""
    import re

    out = {}
    for doc_id, text in texts.items():
        toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        votes = [0] * n_bits
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            h_lo = int(h[0:15], 16) % (1 << 32)
            h_hi = int(h[16:31], 16) % (1 << 32)
            for j in range(n_bits):
                src = h_lo if j < 32 else h_hi
                votes[j] += 1 if (src >> (j % 32)) & 1 else -1
        sig = 0
        for j in range(n_bits):
            if votes[j] > 0:
                sig += -(1 << 63) if j == 63 else (1 << j)
        out[doc_id] = sig
    return out


def test_simhash_vote_rewrite_bit_identical(spark):
    """Round 17 rewrote the vote aggregate from 64 conditional ±1 sums
    to plain bit sums + one count (votes_j = 2*sum(bit_j) - n).  The
    signatures must equal an independent Python recomputation of the
    published definition."""
    from datalakehouse_spark.operators.dedup import simhash_df

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy dog",
        3: "pack my box with five dozen liquor jugs",
        4: "a b",
        5: "single",
        6: "The   QUICK brown  fox ",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash_df(df).collect()}
    assert got == _py_simhash(texts)
    # the 32-bit config (fixture-scale) must agree on its 32-bit prefix
    got32 = {r["doc_id"]: r["simhash"] for r in simhash_df(df, n_bits=32).collect()}
    want32 = {
        k: sum(
            (1 << j)
            for j in range(32)
            if _py_simhash({k: v}, 64)[k] & (1 << j)
        )
        for k, v in texts.items()
    }
    assert got32 == want32


def test_simhash_pair_join_reads_one_materialized_frame(spark, tmp_path):
    """The pair join's two legs must read the ONE materialized bucket
    frame (round 17): the physical plan of the join contains no parquet
    scan — both legs are ExistingRDD reads — and the result equals the
    exhaustive quadratic scan."""
    import io
    from contextlib import redirect_stdout

    from datalakehouse_spark.operators.dedup import simhash_df, simhash_near_dup_pairs

    rows = [
        (i, f"shared boilerplate prefix tokens here with tail number {i % 3}")
        for i in range(30)
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    docs = spark.read.parquet(src)
    pairs = simhash_near_dup_pairs(docs)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pairs.explain("formatted")
    plan = buf.getvalue()
    assert "Scan parquet" not in plan, "pair legs re-ran the simhash pipeline"
    assert plan.count("Scan ExistingRDD") >= 2
    # exhaustive truth: every pair within hamming <= 3
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_df(docs).collect()}
    want = {
        (a, b, bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1"))
        for a in sigs
        for b in sigs
        if a < b and bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()}
    assert got == want


def test_materialize_modes_same_rows(spark, tmp_path):
    """materialize() must return the same rows under every policy mode
    and reject unknown modes."""
    from datalakehouse_spark.materialize import CONF_KEY, materialize

    df = spark.range(100).withColumn("v", F.col("id") % 7)
    want = sorted((r["id"], r["v"]) for r in df.collect())
    old = spark.conf.get(CONF_KEY, "local")
    try:
        for mode in ("local", "persist"):
            spark.conf.set(CONF_KEY, mode)
            out = materialize(df)
            assert sorted((r["id"], r["v"]) for r in out.collect()) == want
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        spark.conf.set(CONF_KEY, "checkpoint")
        out = materialize(df)
        assert sorted((r["id"], r["v"]) for r in out.collect()) == want
        spark.conf.set(CONF_KEY, "bogus")
        with pytest.raises(ValueError):
            materialize(df)
    finally:
        spark.conf.set(CONF_KEY, old)
