"""Unit tests for the distributed global-ranking operators.

``operators/ranking.py`` replaces single-partition windows (the
``WindowExec: No Partition Defined`` scale-killer) with range-bucketed
equivalents; these tests pin the equivalence against the window forms on
small data where the single-partition window is safe to run, including
the tie, NULL-ordering, remainder-tile, and empty-frame edges.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datalakehouse_spark.operators.ranking import (
    ntile_from_rank,
    percent_rank_from_rank,
    with_global_rank,
    with_global_ranks,
    with_prefix_max,
)

# values with duplicates, negatives, and a skewed run of equal keys —
# ties must co-bucket and resolve purely by the tiebreak column
_VALS = [5.0, -3.0, 5.0, 0.0, 12.5, 5.0, -3.0, 7.0, 7.0, 0.0, 99.0, -8.25, 5.0]


def _df(spark, vals=_VALS):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, v double"
    ).repartition(4)


def _collect_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


@pytest.mark.parametrize("asc", [True, False], ids=["asc", "desc"])
@pytest.mark.parametrize("n_buckets", [1, 3, 64])
def test_with_global_rank_matches_window(spark, asc, n_buckets):
    df = _df(spark)
    order = [("v", asc), ("id", True)]
    got = _collect_map(
        with_global_rank(df, order, rank_col="r", n_buckets=n_buckets), "id", "r"
    )
    w = Window.orderBy(F.col("v").asc() if asc else F.col("v").desc(), F.col("id"))
    want = _collect_map(df.select("id", F.row_number().over(w).alias("r")), "id", "r")
    assert got == want


@pytest.mark.parametrize("asc", [True, False], ids=["asc", "desc"])
def test_with_global_rank_null_lead_matches_window_default(spark, asc):
    """NULL leading values must land at Spark's window-default null
    position (ASC ⇒ NULLS FIRST, DESC ⇒ NULLS LAST), not collapse into
    bucket 0 (the pre-round-7 latent bug)."""
    vals = [2.0, None, 7.0, None, -1.0, 7.0, None]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, v double"
    ).repartition(3)
    order = [("v", asc), ("id", True)]
    got = _collect_map(with_global_rank(df, order, rank_col="r", n_buckets=4), "id", "r")
    w = Window.orderBy(F.col("v").asc() if asc else F.col("v").desc(), F.col("id"))
    want = _collect_map(df.select("id", F.row_number().over(w).alias("r")), "id", "r")
    assert got == want


def test_with_global_rank_empty_and_single_row(spark):
    empty = _df(spark, []).where(F.lit(False))
    assert with_global_rank(empty, [("v", True), ("id", True)], "r").count() == 0
    one = _df(spark, [42.0])
    assert _collect_map(
        with_global_rank(one, [("v", True), ("id", True)], "r"), "id", "r"
    ) == {0: 1}


def test_with_global_ranks_shared_bucketing_matches_separate_passes(spark):
    """The ntile_percent_rank shape: DESC and ASC ranks off ONE
    bucketing pass must equal two independent passes."""
    df = _df(spark)
    both = with_global_ranks(
        df,
        {
            "rd": [("v", False), ("id", True)],
            "ra": [("v", True), ("id", True)],
        },
        n_buckets=4,
    )
    rd = _collect_map(both, "id", "rd")
    ra = _collect_map(both, "id", "ra")
    assert rd == _collect_map(
        with_global_rank(df, [("v", False), ("id", True)], "rd", n_buckets=7),
        "id",
        "rd",
    )
    assert ra == _collect_map(
        with_global_rank(df, [("v", True), ("id", True)], "ra", n_buckets=7),
        "id",
        "ra",
    )


def test_with_global_ranks_rejects_mismatched_lead(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="must lead with"):
        with_global_ranks(
            df, {"a": [("v", True)], "b": [("id", True)]}, n_buckets=4
        )
    with pytest.raises(ValueError, match="at least one"):
        with_global_ranks(df, {})


@pytest.mark.parametrize("k", [1, 3, 4, 5, 13, 50])
def test_ntile_from_rank_matches_window_ntile(spark, k):
    """Remainder tiles (n % k != 0), exact division, k == n, and
    n < k — all four regimes against Spark's own ntile()."""
    df = _df(spark)  # n = 13
    w = Window.orderBy("v", "id")
    want = _collect_map(df.select("id", F.ntile(k).over(w).alias("t")), "id", "t")
    ranked = with_global_rank(df, [("v", True), ("id", True)], "r", n_buckets=4)
    n_df = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    got = _collect_map(
        ranked.crossJoin(F.broadcast(n_df)).select(
            "id", ntile_from_rank(F.col("r"), F.col("n"), k).alias("t")
        ),
        "id",
        "t",
    )
    assert got == want


def test_percent_rank_from_rank_matches_window(spark):
    df = _df(spark)
    w = Window.orderBy("v", "id")
    want = _collect_map(
        df.select("id", F.percent_rank().over(w).alias("p")), "id", "p"
    )
    ranked = with_global_rank(df, [("v", True), ("id", True)], "r", n_buckets=4)
    n_df = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    got = _collect_map(
        ranked.crossJoin(F.broadcast(n_df)).select(
            "id", percent_rank_from_rank(F.col("r"), F.col("n")).alias("p")
        ),
        "id",
        "p",
    )
    assert got == pytest.approx(want)


def test_percent_rank_single_row_is_zero(spark):
    one = _df(spark, [7.0])
    row = one.select(
        percent_rank_from_rank(F.lit(1).cast("long"), F.lit(1).cast("long")).alias("p")
    ).first()
    assert row["p"] == 0.0


@pytest.mark.parametrize("asc", [True, False], ids=["asc", "desc"])
def test_with_prefix_max_matches_window(spark, asc):
    """The skyline sweep aggregate: first global row must be NULL (empty
    frame), later rows the running max over all strictly-earlier rows."""
    df = _df(spark)
    order = [("v", asc), ("id", True)]
    got = _collect_map(
        with_prefix_max(df, order, "v", out_col="m", n_buckets=4), "id", "m"
    )
    w = (
        Window.orderBy(F.col("v").asc() if asc else F.col("v").desc(), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = _collect_map(df.select("id", F.max("v").over(w).alias("m")), "id", "m")
    assert got == want
    first_id = min(
        (r["id"] for r in df.collect()),
        key=lambda i: ((_VALS[i] if asc else -_VALS[i]), i),
    )
    assert got[first_id] is None


def test_with_global_rank_plan_has_no_unpartitioned_window(spark):
    """The whole point: the distributed form must never plan a
    single-partition window."""
    from tests.test_plans import unpartitioned_windows

    df = with_global_rank(_df(spark), [("v", True), ("id", True)], "r")
    assert unpartitioned_windows(df) == []


# ---------------------------------------------------------------------------
# Property test: distributed rank == single-partition window on arbitrary
# doubles (duplicates, NULLs, NaN, ±inf — the full Spark ordering domain)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_vals = st.lists(
    st.one_of(
        st.none(),
        st.sampled_from([float("nan"), float("inf"), float("-inf"), 0.0, -0.0]),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.sampled_from([1.0, 1.0, -3.5]),  # force duplicate-heavy cases
    ),
    min_size=0,
    max_size=30,
)


@given(vals=_vals, asc=st.booleans(), n_buckets=st.sampled_from([1, 3, 8]))
@settings(max_examples=12, deadline=None)
def test_with_global_rank_property(spark, vals, asc, n_buckets):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, v double"
    ).repartition(3)
    got = _collect_map(
        with_global_rank(df, [("v", asc), ("id", True)], "r", n_buckets=n_buckets),
        "id",
        "r",
    )
    w = Window.orderBy(F.col("v").asc() if asc else F.col("v").desc(), F.col("id"))
    want = _collect_map(df.select("id", F.row_number().over(w).alias("r")), "id", "r")
    assert got == want


def test_with_global_ranks_cache_is_leak_free_checkpoint(spark):
    """cache=True materializes via localCheckpoint: the DataFrame-level
    CacheManager (where a forgotten ``persist`` handle would pin an
    entry until an explicit unpersist) gains nothing — checkpoint
    blocks are RDD-level and freed by the ContextCleaner when the
    result is dropped — and the result matches cache=False
    bit-for-bit."""
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(50)], "id int, v double")
    cm = spark._jsparkSession.sharedState().cacheManager()
    was_empty = cm.isEmpty()
    out = with_global_ranks(df, {"r": [("v", True), ("id", True)]}, cache=True)
    plain = with_global_ranks(df, {"r": [("v", True), ("id", True)]}, cache=False)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
    assert cm.isEmpty() == was_empty  # no un-unpersistable entry left
    # and the plan really reads the checkpointed frame, not the source
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()


def test_with_global_rank_splits_are_literal_no_second_scan_branch(spark):
    """Round-8 contract: split points and bucket offsets are embedded as
    LITERALS (sampled eagerly, the repartitionByRange idiom) — the
    returned plan must contain no percentile_approx aggregate and no
    bucket-count join branch, so correctness cannot depend on exchange
    reuse between sibling subtrees."""
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
    plan = with_global_rank(
        df, [("v", True), ("id", True)], "r"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" not in plan
    assert "Join" not in plan


def test_with_prefix_max_nan_poisons_prefix_like_window(spark):
    """Spark's running MAX ranks NaN above every real value, so a NaN
    in an early bucket must dominate every later row's prefix — the
    driver-side prefix fold has to replicate that, not Python's
    order-dependent max() (round-8 review finding, confirmed live)."""
    rows = [(k, float("nan") if k == 3 else float(k * 10)) for k in range(10)]
    df = spark.createDataFrame(rows, "id int, v double").repartition(3)
    got = _collect_map(
        with_prefix_max(df, [("id", True)], "v", out_col="m", n_buckets=4), "id", "m"
    )
    w = (
        Window.orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = _collect_map(df.select("id", F.max("v").over(w).alias("m")), "id", "m")

    def norm(d):
        return {k: ("nan" if isinstance(v, float) and v != v else v) for k, v in d.items()}

    assert norm(got) == norm(want)


def test_ntile_entry_small_and_large_paths_agree(spark, monkeypatch):
    """The size-adaptive ntile_percent_rank entry (round 10) must
    produce IDENTICAL rows from its small (native global windows) and
    large (bucketed distributed ranker) plans — forced via the
    module-level threshold."""
    import datalakehouse_spark.registry_ext2 as ext2

    sf = "/root/testdata/sf0.001"
    small = sorted(map(tuple, ext2.q_ntile(spark, sf).collect()))
    monkeypatch.setattr(ext2, "_NTILE_DISTRIBUTED_MIN_BYTES", 0)
    large = sorted(map(tuple, ext2.q_ntile(spark, sf).collect()))
    assert small == large
    assert len(small) > 0
