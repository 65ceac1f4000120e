#!/usr/bin/env python
"""Scale ladder for ``streaming_incremental_dedup`` (round 15).

Grows the sf0.1 documents corpus by shifted copies whose FIRST token
is perturbed, so every copy carries a DISTINCT prefix digest — the
expensive growth direction for a continuous-crawl dedup: the session
survivor index grows ∝ corpus (the trailing-token perturbation would
instead make every copy a digest-dup and the index tiny).  n_slices
stays fixed at 4, so per-trigger batch size grows ∝ corpus too — the
realistic mode where a day's crawl gets bigger, not more numerous.

Invariant per step: docs/s holds or rises vs step 1 (>= ~0.7x) — a
collapse means a hidden driver-side or single-task stage in the drain.
The per-batch joins must stay digest-keyed broadcast/equi joins; the
VersionedTable commits are ∝ survivors, not corpus.

Usage: python tools/scale_smoke_stream_dedup.py [mults...]  (default 1 4 16)
Prints one JSON line per mult; paste into docs/SCALING_RESULTS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.operators.dedup import (  # noqa: E402
    prefix_digest,
    streaming_incremental_dedup_drain,
)
from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synthesized_digests(spark, mult: int):
    base = load_table(spark, BASE_SF, "documents").select(
        "doc_id", "source", "text"
    )
    max_id = base.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
            "source",
            # perturb the FIRST token -> distinct prefix digest per copy
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text")
            if i
            else F.col("text"),
        )
        for i in range(mult)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.select(
        "doc_id", "source", prefix_digest(F.col("text")).alias("digest")
    )


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale_smoke_stream_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    base_rate = None
    for mult in mults:
        digests = synthesized_digests(spark, mult)
        n_docs = digests.count()
        root = tempfile.mkdtemp(prefix=f"ssd_m{mult}_")
        t0 = time.perf_counter()
        stats = streaming_incremental_dedup_drain(
            spark, digests, root, batch_pred=F.col("doc_id") % 4 == 3
        )
        rows = stats.collect()  # tiny: one row per source
        wall = time.perf_counter() - t0
        shutil.rmtree(root, ignore_errors=True)
        rate = n_docs / wall
        if base_rate is None:
            base_rate = rate
        print(
            json.dumps(
                {
                    "mult": mult,
                    "n_docs": n_docs,
                    "wall_s": round(wall, 2),
                    "docs_per_s": round(rate, 1),
                    "rate_vs_base": round(rate / base_rate, 2),
                    "throughput_holds": rate >= 0.7 * base_rate,
                    "n_ingested": int(sum(r["n_ingested"] for r in rows)),
                    "n_dup_corpus": int(
                        sum(r["n_dup_corpus"] for r in rows)
                    ),
                    "n_dup_batch": int(sum(r["n_dup_batch"] for r in rows)),
                },
                separators=(",", ":"),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
