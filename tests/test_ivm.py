"""additive_merge: the partial-aggregate combine behind incremental
view maintenance (operators/ivm.py)."""

from decimal import Decimal

from pyspark.sql import functions as F

from datalakehouse_spark.operators.ivm import additive_merge


def _state(spark, rows):
    df = spark.createDataFrame(rows, "k string, day int, n long, s decimal(18,2)")
    return df


def test_merge_updates_inserts_and_preserves(spark):
    base = _state(
        spark,
        [("a", 1, 2, Decimal("10.50")), ("b", 1, 1, Decimal("3.00"))],
    )
    delta = _state(
        spark,
        [("a", 1, 3, Decimal("0.25")), ("c", 2, 4, Decimal("7.00"))],
    )
    out = {
        (r["k"], r["day"]): (r["n"], r["s"])
        for r in additive_merge(base, delta, ["k", "day"], ["n", "s"]).collect()
    }
    assert out[("a", 1)] == (5, Decimal("10.75"))  # combined
    assert out[("b", 1)] == (1, Decimal("3.00"))  # base-only preserved
    assert out[("c", 2)] == (4, Decimal("7.00"))  # delta-only inserted
    assert len(out) == 3


def test_merge_is_exact_vs_full_recompute(spark):
    """Decimal carriage makes incremental == full bit-exact, including
    the final double conversion."""
    rows = [(f"u{i % 7}", i % 3, 1, Decimal(str(i)) / 4) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, day int, n long, s decimal(18,2)")
    agg = lambda d: d.groupBy("k", "day").agg(  # noqa: E731
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    full = agg(df)
    half1 = agg(df.where(F.col("s") * 4 % 2 == 0))
    half2 = agg(df.where(F.col("s") * 4 % 2 != 0))
    merged = additive_merge(half1, half2, ["k", "day"], ["n", "s"])
    key = lambda r: (r["k"], r["day"])  # noqa: E731
    fm = {key(r): (r["n"], float(r["s"])) for r in full.collect()}
    mm = {key(r): (r["n"], float(r["s"])) for r in merged.collect()}
    assert fm == mm


def test_merge_null_safe_keys(spark):
    base = _state(spark, [(None, 1, 1, Decimal("1.00"))])
    delta = _state(spark, [(None, 1, 2, Decimal("2.00"))])
    out = additive_merge(base, delta, ["k", "day"], ["n", "s"]).collect()
    assert len(out) == 1 and out[0]["n"] == 3 and out[0]["s"] == Decimal("3.00")


def test_streaming_mv_commits_per_batch(spark):
    """The foreachBatch refresh must actually micro-batch (4 restaged
    files -> 4 commits: 1 create + 3 merges) and finish equal to the
    one-shot batch rollup."""
    import os

    from datalakehouse_spark.io import load_table
    from datalakehouse_spark.registry import REGISTRY, _load_extensions
    from datalakehouse_spark.scratch import _root
    from datalakehouse_spark.versioned import VersionedTable

    _load_extensions()
    sf = "/root/testdata/sf0.001"
    out = REGISTRY["streaming_incremental_mv"].fn(spark, sf)
    got = {
        (r["user_id"], str(r["day"])): (r["n"], r["sum_value"]) for r in out.collect()
    }
    ev = load_table(spark, sf, "events")
    want = {
        (r["user_id"], str(r["day"])): (r["n"], float(r["s"]))
        for r in ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert got == want
    mv_path = os.path.join(_root(), "stream_ivm", "mv")
    t = VersionedTable(spark, mv_path)
    assert t.refs()["main"] >= 4, "expected one commit per micro-batch"
