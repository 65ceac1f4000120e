"""Relational operator library (SURVEY.md §2.3/2.5/2.6/2.7).

The reference contains no joins or window functions — its model is fully
denormalized at ingest — but join/window/set-op capability is part of the
engine surface its users query through Trino/Spark SQL (SURVEY.md §2.3).
These are the first-class rebuild operators, each a pure
``DataFrame -> DataFrame`` function with an explicit scale posture.

Scale notes baked in:
- ``latest_per_key``: window row_number shuffles once on the key; the
  ``max_by`` variant is one hash aggregate with map-side partials —
  prefer it at 100 TB when only one payload column family is needed.
- ``top_k``: global orderBy+limit compiles to TakeOrderedAndProject
  (per-partition heap + driver merge), never a full sort.
- ``asof_join``: union + window trick — one shuffle on the key, no
  BroadcastNestedLoopJoin, no per-group pandas. This scales to arbitrary
  fact sizes because state per key is one running "last seen right row".
- ``range_join``: equi-key + range predicate stays a hash/sort-merge join
  on the equi key; only keyless range joins degrade to BNLJ (avoided).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str, tiebreak: str | None = None
) -> DataFrame:
    """Latest row per key via window row_number (SURVEY.md §2.5).

    The reference achieves "latest per device" with a PK upsert sink
    (README:194); in a pure-query engine it's rank-and-filter.
    """
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def latest_per_key_maxby(
    df: DataFrame, keys: Sequence[str], order_col: str, payload: Sequence[str]
) -> DataFrame:
    """Latest-per-key as an aggregate: ``max_by(struct(payload), order)``.

    One HashAggregate with partial aggregation — at scale this beats the
    window variant (no sort, smaller shuffle).  ``order_col`` must be
    unique per key for determinism; compose a struct order key if not.
    """
    agg = [F.max_by(F.col(c), F.col(order_col)).alias(c) for c in payload]
    agg.append(F.max(F.col(order_col)).alias(order_col))
    return df.groupBy(*keys).agg(*agg)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (O3)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """Top-k within each group via window rank."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")


def union_by_name(*dfs: DataFrame) -> DataFrame:
    """Unified view over the per-vendor raw tables (SURVEY.md §2.7)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + range-predicate join.

    Keeping an equality conjunct means Catalyst plans a hash or
    sort-merge join with the range condition as a post-join filter —
    never a nested-loop cross product.
    """
    return left.join(right, equi & range_cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` for the same key (SURVEY.md §2.3).

    Spark has no native as-of join; the scalable composition is
    union-and-carry-forward:

    1. tag both sides, union on (key, ts);
    2. one window per key ordered by (ts, side) computes
       ``last(right_payload, ignorenulls=True)`` — the running most
       recent right row;
    3. keep left rows.

    One shuffle, one sort, O(1) state per key — no range blow-up, no
    pandas.  (Alternative for small rights: broadcast + max_by.)
    """
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in right_payload],
        )
        .withColumn("_side", F.lit(0))
    )
    payload_struct = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in right_payload])
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True).withColumn(
        "_payload", payload_struct
    )
    # right rows sort before left rows at the same timestamp (`<=` semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_last", F.last("_payload", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns]
    picked = [F.col(f"_last.{c}").alias(c) for c in right_payload]
    return carried.where(F.col("_side") == 1).select(*out_cols, *picked)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2 without MERGE (catalog-free):

    1. close out current rows whose key appears in the updates
       (set valid_to = new row's ts, is_current = false);
    2. append the update rows as new current versions.

    Emulation via broadcast semi/anti joins + union — the guide's
    documented pattern when MERGE INTO isn't available; with Delta or
    Iceberg this compiles to one MERGE statement.  ``updates`` must hold
    one row per key (pre-deduplicate with latest_per_key otherwise).
    """
    upd_keys = updates.select(F.col(key), F.col(ts_col).alias("_new_ts"))
    closed = (
        dim.join(F.broadcast(upd_keys), on=key, how="inner")
        .where(F.col(current_col))
        .withColumn(end_col, F.col("_new_ts"))
        .withColumn(current_col, F.lit(False))
        .drop("_new_ts")
    )
    untouched_current = dim.join(
        F.broadcast(upd_keys.select(key)), on=key, how="left_anti"
    ).where(F.col(current_col))
    history = dim.where(~F.col(current_col))
    fresh = (
        updates.withColumn(end_col, F.lit(None).cast(dim.schema[end_col].dataType))
        .withColumn(current_col, F.lit(True))
        .select(*dim.columns)
    )
    return history.unionByName(closed).unionByName(untouched_current).unionByName(fresh)


def salted_count(df: DataFrame, keys: Sequence[str], n_salts: int = 16) -> DataFrame:
    """Skew-resistant count: two-stage aggregation through a salt.

    Stage 1 groups on (key, salt) — a hot key's rows spread over
    ``n_salts`` reducers; stage 2 sums the partials on the key alone.
    Same result as a plain groupBy().count(); use when one key holds a
    double-digit percent of the data and AQE skew handling isn't enough
    (AQE splits skewed *joins*, not aggregations — though partial
    aggregation already absorbs most agg skew; salting matters for
    high-cardinality payload aggs like collect_list).
    """
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    partial = df.select(*keys, salt).groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return partial.groupBy(*keys).agg(F.sum("_c").alias("n"))


def sessionize(
    df: DataFrame, key: str, ts_col: str, gap_minutes: int = 30
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_minutes``.

    lag + conditional cumsum over one key-partitioned window — the
    standard batch sessionization (streaming twin: ``session_window``).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("_new", new_session).withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new")
