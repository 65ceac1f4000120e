"""Bucketed (co-located) tables — the shuffle-elimination technique for
repeated joins/aggregations on a hot key.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem on
orderkey) is the shuffle of BOTH sides.  Spark's table bucketing
(``bucketBy(n, key).sortBy(key).saveAsTable``) hash-partitions the data
into a fixed number of bucket FILES at write time; a join between two
tables bucketed on the join key with the same bucket count reads
co-located buckets and needs NO Exchange on either side — the physical
plan is scan -> SortMergeJoin with the shuffles gone (and the sortBy
lets Spark skip the per-bucket sort when each bucket is one file).
The write is paid once; every downstream join/agg on the key rides it
— exactly the "pre-partition the fact tables on the entity key"
strategy a production lakehouse uses for its hottest join.

This module keeps the surface tiny: ``ensure_bucketed_table``
idempotently materializes a bucketed copy (session-catalog memo: the
default in-memory catalog scopes table metadata to the session, so a
fresh session rewrites and a warm one reuses), and the registry entry
``bucketed_colocated_join`` (registry_ext6.py) runs the canonical
revenue join over it with the no-Exchange property plan-asserted in
tests/test_plans.py.

Reference anchor: the reference clusters/distributes writes by key
(create.sql:53-56 write.distribution-mode) for the same co-location
purpose; Spark's bucketing is the engine-native equivalent.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

__all__ = ["ensure_bucketed_table", "bucket_tag", "default_bucket_count"]


def bucket_tag(sf_dir: str) -> str:
    """Catalog-safe tag for a fixture directory (bucketed copies of
    different scale factors must not collide)."""
    return re.sub(r"[^0-9a-z]+", "_", sf_dir.lower()).strip("_")


def default_bucket_count(spark: SparkSession) -> int:
    """The capacity rule, in the API (round 13; the round-12 ladder
    measured it — docs/SCALING_RESULTS.md: 8 buckets capped read
    parallelism at 8 tasks and LOST to a plain shuffle join at 16x on
    32 cores; 32 buckets won 2.2x): bucket count must be sized to the
    cluster's task parallelism, so the default is
    ``defaultParallelism`` (executors x cores locally; at 100 TB the
    caller additionally sizes for data growth — a bucket should stay
    well under an executor's memory)."""
    return max(int(spark.sparkContext.defaultParallelism), 1)


def ensure_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Materialize ``df`` as a parquet table bucketed (and sorted)
    on ``key`` unless the session catalog already has it; return the
    table reader.  ``n_buckets`` defaults to the capacity rule
    (:func:`default_bucket_count`) — an explicit constant is a
    fixture-scale choice the caller owns."""
    if n_buckets is None:
        n_buckets = default_bucket_count(spark)
    if not spark.catalog.tableExists(name):
        # the default in-memory catalog forgets tables between sessions
        # but their files persist in the warehouse dir — creating a
        # managed table over a leftover location is LOCATION_ALREADY_
        # EXISTS, so clear the orphan first.  Scoped to the bkt_
        # fixture namespace: a shared/persistent warehouse may hold a
        # live same-named table another session owns (ADVICE r12), and
        # this helper must never delete data it didn't write.
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if wh and name.startswith("bkt_"):
            shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    return spark.table(name)
