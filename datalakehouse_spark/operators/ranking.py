"""Distributed global ranking — no single-partition WindowExec.

A global ``row_number()/ntile()/percent_rank()`` with an empty PARTITION BY
funnels every row through ONE task (Spark logs ``WindowExec: No Partition
Defined``) — the canonical scale-killer.  The reference sidesteps the
problem by never ranking globally (its queries are per-device,
README:160-214); the rebuild's analytics tier does rank globally, so it
needs the distributed form:

1. **Range-bucket** rows on the leading sort column using
   ``percentile_approx`` split points — the same sample-the-bounds idea
   Spark's own ``RangePartitioner`` / ``repartitionByRange`` uses for
   global sorts, expressed declaratively (the splits are a 1-row aggregate
   broadcast to every row; bucket id is a pure function of the VALUE, so
   duplicate values always share a bucket and cross-bucket order is
   strict).
2. **Rank locally** with a window PARTITIONED BY bucket — parallel,
   bounded partitions.
3. **Offset** each bucket by the total row count of the buckets before it
   — a ≤``n_buckets``-row aggregate joined back via broadcast.

``global_rank = bucket_offset + local_rank``.  The result is identical to
the single-partition window (the final order key must be a total order —
pass a unique tiebreak column) but every stage is distributed; split-point
*accuracy* only affects balance, never correctness.

Both the window branch and the count branch read the same bucketed
subtree, so AQE's exchange reuse materializes the bucket shuffle (and the
split-point aggregate under it) once per action.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_global_rank",
    "with_prefix_max",
    "ntile_from_rank",
    "percent_rank_from_rank",
]


def _range_bucketed(
    df: DataFrame, order: Sequence[tuple[str, bool]], n_buckets: int
) -> DataFrame:
    """Range-bucket ``df`` on the leading sort column (see module doc).

    Bucket id is a pure function of the value — equal values always
    co-bucket, so rows of bucket ``i`` sort strictly before every row of
    bucket ``j > i`` regardless of tiebreak columns.
    """
    lead_col, lead_asc = order[0]
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    splits = df.agg(
        F.percentile_approx(F.col(lead_col), probs, F.lit(10_000)).alias("__splits")
    )
    if lead_asc:
        pred = lambda s: s < F.col(lead_col)  # noqa: E731
    else:
        pred = lambda s: s > F.col(lead_col)  # noqa: E731
    return (
        df.crossJoin(F.broadcast(splits))
        .withColumn("__bucket", F.size(F.filter(F.col("__splits"), pred)))
        .drop("__splits")
    )


def with_global_rank(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    rank_col: str = "global_rank",
    n_buckets: int = 64,
) -> DataFrame:
    """Add a 1-based global ``row_number`` over ``order`` without a
    single-partition window.

    ``order`` is ``[(column, ascending), ...]``; the full key must be a
    total order (include a unique tiebreak) and the LEADING column must be
    numeric and non-null — it is the range-bucketing key.
    """
    bucketed = _range_bucketed(df, order, n_buckets)
    w = Window.partitionBy("__bucket").orderBy(*_order_cols(order))
    local = bucketed.withColumn("__local_rank", F.row_number().over(w))
    counts = bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.__bucket") < F.col("a.__bucket"), "left")
        .groupBy(F.col("a.__bucket").alias("__bucket"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).cast("long").alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(rank_col, (F.col("__offset") + F.col("__local_rank")).cast("long"))
        .drop("__bucket", "__local_rank", "__offset")
    )


def _order_cols(order: Sequence[tuple[str, bool]]) -> list[Column]:
    return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]


def with_prefix_max(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    value_col: str,
    out_col: str = "prefix_max",
    n_buckets: int = 64,
) -> DataFrame:
    """Add ``MAX(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)`` — the 2D-skyline sweep aggregate — without a
    single-partition window.

    Same bucketing as :func:`with_global_rank`: the running max splits
    into a bucket-local window (partitioned, parallel) combined with the
    max over all STRICTLY EARLIER buckets (a ≤``n_buckets``-row prefix
    aggregate joined back via broadcast).  First row globally gets NULL,
    matching the window form's empty-frame semantics.
    """
    bucketed = _range_bucketed(df, order, n_buckets)
    w = (
        Window.partitionBy("__bucket")
        .orderBy(*_order_cols(order))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("__local_max", F.max(value_col).over(w))
    bmax = bucketed.groupBy("__bucket").agg(F.max(value_col).alias("__bmax"))
    a, b = bmax.alias("a"), bmax.alias("b")
    prev = (
        a.join(F.broadcast(b), F.col("b.__bucket") < F.col("a.__bucket"), "left")
        .groupBy(F.col("a.__bucket").alias("__bucket"))
        .agg(F.max("b.__bmax").alias("__prev_max"))
    )
    return (
        local.join(F.broadcast(prev), "__bucket")
        # greatest() skips NULLs: bucket-local empty frame and/or no
        # earlier bucket degrade exactly like the window's empty frame
        .withColumn(out_col, F.greatest("__local_max", "__prev_max"))
        .drop("__bucket", "__local_max", "__prev_max")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``NTILE(k)`` computed arithmetically from a global rank.

    Standard NTILE semantics: with ``n`` rows, the first ``n % k`` tiles
    hold ``n div k + 1`` rows, the rest ``n div k``.  ``rank`` is the
    1-based position in the tile order; ``n`` the total row count (both
    long Columns).  ``floor(x/0)`` is NULL-safe SQL, and when
    ``n < k`` every rank lands in the first branch, so the base-0 case
    never divides.
    """
    base = F.floor(n / F.lit(k))
    rem = n % F.lit(k)
    cutoff = rem * (base + 1)
    return F.when(
        rank <= cutoff, F.floor((rank - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((rank - 1 - cutoff) / base) + 1).cast("int")


def percent_rank_from_rank(rank: Column, n: Column) -> Column:
    """SQL ``PERCENT_RANK()`` from a global rank: ``(rank-1)/(n-1)``.

    ``rank`` must come from a TOTAL order (unique tiebreak), under which
    RANK == ROW_NUMBER.  Single-row input yields 0.0 per the SQL spec.
    """
    return F.when(n > 1, (rank - 1) / (n - 1)).otherwise(F.lit(0.0))
