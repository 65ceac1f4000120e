"""Incremental view maintenance (IVM): keep a materialized aggregate
current by merging a delta batch's PARTIAL aggregates into the stored
state, instead of recomputing from the full fact table.

The lakehouse pattern behind Iceberg/Delta "incremental refresh"
(reference analog: the nightly risk rollup re-merged per batch,
SURVEY.md §3.2 / config/flink create.sql's continuous aggregation):
additive measures (COUNT, SUM) form a commutative monoid, so

    agg(full) == combine(agg(old_rows), agg(delta_rows))

per group key.  At 100 TB the payoff is the whole point: refreshing a
daily rollup after a 0.1% delta batch costs one scan of the DELTA plus
a keyed merge against only the AFFECTED groups — not a re-scan of the
fact table.

Exactness contract: double SUMs are order-dependent, so a merged
double would drift from a full recompute by ulps.  Additive sums must
therefore be carried as DECIMAL in the materialized state
(functions/numeric.dsum with ``as_double=False``) and converted to
double only at read time — decimal addition is exact and associative,
making incremental == full BIT-EXACT (the oracle gate proves it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def additive_merge(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
) -> DataFrame:
    """Combine two partial-aggregate states group-wise.

    ``base`` and ``delta`` carry the same schema: ``keys`` plus
    additive ``measures`` (LONG counts / DECIMAL sums — NOT doubles,
    see module docstring).  Returns the merged state with one row per
    key present in either side.

    Shape: a full outer equi-join on the group keys — the only shuffle
    is on the key both inputs are already aggregated by, and when the
    base is a partitioned table filtered to affected partitions the
    join degenerates to a per-partition merge.  For a delta-only
    upsert path, join the delta LEFT against base and MERGE the result
    (only affected keys move) — see the ``incremental_mv_maintenance``
    registry entry.
    """
    b = base.select(keys + measures)
    d = delta.select(keys + measures)
    renamed = d.select(
        *[F.col(k).alias(f"_d_{k}") for k in keys],
        *[F.col(m).alias(f"_d_{m}") for m in measures],
    )
    cond = [b[k].eqNullSafe(renamed[f"_d_{k}"]) for k in keys]
    joined = b.join(renamed, cond, "full_outer")
    out_keys = [
        F.coalesce(b[k], renamed[f"_d_{k}"]).alias(k) for k in keys
    ]
    zero = F.lit(0)
    out_measures = [
        (
            F.coalesce(b[m], zero.cast(dict(b.dtypes)[m]))
            + F.coalesce(renamed[f"_d_{m}"], zero.cast(dict(d.dtypes)[m]))
        ).alias(m)
        for m in measures
    ]
    return joined.select(*out_keys, *out_measures)
