"""Batch-split invariance of the streaming continuous-crawl dedup
(operators/dedup.streaming_incremental_dedup_drain, round 15).

The production claim the oracle can only check at ONE slicing: the
final per-source accounting is independent of HOW the crawl batch was
micro-batched.  Here the same corpus drains as 1, 3, and 5 slices and
every slicing must produce identical totals — and those totals must
equal the one-shot batch computation (the incremental_dedup_ingest
shape) on the same digests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakehouse_spark.io import load_table
from datalakehouse_spark.operators.dedup import (
    prefix_digest,
    streaming_incremental_dedup_drain,
)

SF = "/root/testdata/sf0.001"


def _one_shot(digests, batch_pred):
    """The batch form (registry entry incremental_dedup_ingest's
    DataFrame shape), as the invariance reference."""
    hist = digests.where(~batch_pred).select("digest").distinct()
    batch = digests.where(batch_pred)
    keep = batch.groupBy("digest").agg(F.min("doc_id").alias("__keep_id"))
    marked = batch.join(keep, "digest").join(
        hist.withColumn("__in_corpus", F.lit(1)), "digest", "left"
    )
    in_c = F.col("__in_corpus").isNotNull()
    first = F.col("doc_id") == F.col("__keep_id")
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(in_c.cast("long")).alias("n_dup_corpus"),
            F.sum((~in_c & ~first).cast("long")).alias("n_dup_batch"),
            F.sum((~in_c & first).cast("long")).alias("n_ingested"),
        )
        .orderBy("source")
    )


@pytest.mark.parametrize("n_slices", [1, 3, 5])
def test_drain_totals_are_slice_invariant(spark, tmp_path, n_slices):
    digests = load_table(spark, SF, "documents").select(
        "doc_id", "source", prefix_digest(F.col("text")).alias("digest")
    )
    pred = F.col("doc_id") % 4 == 3
    got = streaming_incremental_dedup_drain(
        spark, digests, str(tmp_path / f"d{n_slices}"), pred, n_slices=n_slices
    ).collect()
    want = _one_shot(digests, pred).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want], (
        f"n_slices={n_slices} drain diverged from the one-shot batch"
    )
