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

NULL leading values are bucketed explicitly to the window's default null
position (Spark: ASC ⇒ NULLS FIRST, DESC ⇒ NULLS LAST), so a nullable
range key ranks identically to the single-partition window instead of
silently collapsing into bucket 0 (the ``F.filter`` predicate would be
NULL for every split).

Execution-sharing caveat: the window branch and the bucket-count branch
both read the bucketed subtree, but their exchanges differ (full rows vs
partial-aggregate rows), so only the broadcast of the ``percentile_approx``
split points is reused by AQE — the base scan executes once per branch.
Hot paths that cannot afford the re-scan should pass ``cache=True`` (a
lazy ``persist()`` of the bucketed frame).  Split points being computed
once per action (the broadcast exchange is reused within an action) is
also what keeps the two branches' bucket ids consistent:
``percentile_approx`` merges are partition-order-sensitive, so the
correctness argument assumes one split computation per action — which the
reused broadcast exchange guarantees.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_global_rank",
    "with_global_ranks",
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
    bucket ``j > i`` regardless of tiebreak columns.  Bucket ids are
    TRAVERSAL positions: bucket 0 is first in the requested order
    (smallest values for ASC, largest for DESC).  NULL leading values go
    to a dedicated bucket at the window default's null position —
    ``-1`` for ASC (NULLS FIRST), ``n_buckets`` for DESC (NULLS LAST).
    """
    lead_col, lead_asc = order[0]
    if lead_asc:
        pred = lambda s: s < F.col(lead_col)  # noqa: E731
        null_bucket = F.lit(-1)  # ASC ⇒ NULLS FIRST: before bucket 0
        # Spark sorts NaN greater than every real value ⇒ last under ASC
        nan_bucket = F.lit(n_buckets)
    else:
        pred = lambda s: s > F.col(lead_col)  # noqa: E731
        null_bucket = F.lit(n_buckets)  # DESC ⇒ NULLS LAST: after the rest
        nan_bucket = F.lit(-1)  # NaN greatest ⇒ first under DESC
    # NaN comparisons are FALSE (not NULL), so without the explicit
    # branch every NaN would silently land in bucket 0 regardless of the
    # sort direction — same latent-corruption class as the NULL case
    special = F.when(F.col(lead_col).isNull(), null_bucket).when(
        # cast: isnan is only defined on float/double; integral leads
        # (e.g. microsecond keys) cast cleanly and are never NaN
        F.isnan(F.col(lead_col).cast("double")), nan_bucket
    )
    if n_buckets <= 1:
        # degenerate single-bucket form (percentile_approx with an empty
        # probe array returns NULL, which would NULL every bucket id)
        return df.withColumn("__bucket", special.otherwise(F.lit(0)))
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    splits = df.agg(
        F.percentile_approx(F.col(lead_col), probs, F.lit(10_000)).alias("__splits")
    )
    return (
        df.crossJoin(F.broadcast(splits))
        .withColumn(
            "__bucket",
            special.otherwise(F.size(F.filter(F.col("__splits"), pred))),
        )
        .drop("__splits")
    )


def with_global_rank(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    rank_col: str = "global_rank",
    n_buckets: int = 64,
    cache: bool = False,
) -> DataFrame:
    """Add a 1-based global ``row_number`` over ``order`` without a
    single-partition window.

    ``order`` is ``[(column, ascending), ...]``; the full key must be a
    total order (include a unique tiebreak) and the LEADING column must
    be numeric — it is the range-bucketing key (NULLs rank at the window
    default's null position, see module doc).
    """
    return with_global_ranks(df, {rank_col: order}, n_buckets=n_buckets, cache=cache)


def with_global_ranks(
    df: DataFrame,
    orders: Mapping[str, Sequence[tuple[str, bool]]],
    n_buckets: int = 64,
    cache: bool = False,
) -> DataFrame:
    """Add several global ``row_number`` columns that share ONE
    range-bucketing pass.

    ``orders`` maps each output rank column to its order spec; every
    spec's LEADING column must be the same (directions may differ —
    e.g. rank by price DESC and price ASC off one bucketing, the
    ``ntile``+``percent_rank`` shape).  Buckets are computed once in
    ascending value order; a descending spec just traverses them in
    reverse, so its offsets sum the counts of HIGHER buckets.  Each
    extra spec costs one partitioned sort + one broadcast join — no new
    shuffle of ``df`` (all windows share the bucket partitioning).

    ``cache=True`` lazily persists the bucketed frame so the window and
    count branches don't each re-execute the base scan (see module doc).
    """
    specs = list(orders.items())
    if not specs:
        raise ValueError("orders must contain at least one rank spec")
    lead_col = specs[0][1][0][0]
    for rank_col, order in specs:
        if order[0][0] != lead_col:
            raise ValueError(
                f"every order must lead with {lead_col!r}; {rank_col!r} leads "
                f"with {order[0][0]!r}"
            )
    # Bucket in ASC value order once; per-spec traversal direction is
    # handled below in the offset comparison.
    bucketed = _range_bucketed(df, [(lead_col, True)], n_buckets)
    if cache:
        bucketed = bucketed.persist()
    counts = bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    out = bucketed
    for i, (rank_col, order) in enumerate(specs):
        lead_asc = order[0][1]
        w = Window.partitionBy("__bucket").orderBy(*_order_cols(order))
        local_col = f"__local_rank_{i}"
        off_col = f"__offset_{i}"
        out = out.withColumn(local_col, F.row_number().over(w))
        a, b = counts.alias("a"), counts.alias("b")
        if lead_asc:
            earlier = F.col("b.__bucket") < F.col("a.__bucket")
        else:
            # DESC traversal: higher ASC-bucket ids come first; the
            # NULL bucket (-1) is traversed last = NULLS LAST.
            earlier = F.col("b.__bucket") > F.col("a.__bucket")
        offsets = (
            a.join(F.broadcast(b), earlier, "left")
            .groupBy(F.col("a.__bucket").alias("__bucket"))
            .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).cast("long").alias(off_col))
        )
        out = (
            out.join(F.broadcast(offsets), "__bucket")
            .withColumn(rank_col, (F.col(off_col) + F.col(local_col)).cast("long"))
            .drop(local_col, off_col)
        )
    return out.drop("__bucket")


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
