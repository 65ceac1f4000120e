#!/usr/bin/env python
"""Round-11 merge_upsert sidecar ladder (VERDICT r10 #7).

The typed parquet key sidecar (versioned.py merge_upsert) adds work to
EVERY upsert commit.  This ladder measures that overhead at growing
batch sizes — the quantity that matters at 100 TB, because the sidecar
scales with the UPSERT BATCH (a day of data), never with the table.

Three timings per ladder step over an events-derived keyed batch:

- ``full``      — merge_upsert as shipped (round 11: NO sidecar write;
                  the manifest records pointers to the commit's own
                  source data files, the source plan is computed
                  exactly once, and the anti-join's key side is a
                  column-pruned scan of the just-written parquet);
- ``no_sidecar`` — the pre-round-10 shape (inline distinct feeding the
                  anti-join, merged union written as one file set,
                  nothing recorded) — the counterfactual baseline;
                  note it computes the source plan TWICE;
- ``sidecar_only`` — the round-10 standalone distinct+write sidecar
                  pass in isolation (the cost the pointer design
                  removed from the hot path).

Usage: python tools/scale_smoke_sidecar.py [mults...] (default 1 10 100)
Prints one JSON line per step; paste into docs/SCALING_RESULTS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402
from datalakehouse_spark.versioned import VersionedTable  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/scale_smoke_sidecar"


def batch(spark, mult: int):
    """events-derived upsert batch: (device_id, report_date) keys with
    a score column; `mult` shifts device ids so volume grows the KEY
    CARDINALITY (the realistic growth mode for an upsert batch)."""
    ev = load_table(spark, BASE_SF, "events").select(
        F.col("user_id").cast("string").alias("device_id"),
        F.to_date("ts").alias("report_date"),
        F.col("value").alias("score"),
    )
    parts = []
    for i in range(mult):
        parts.append(
            ev.select(
                F.concat(F.lit(f"m{i}-"), F.col("device_id")).alias("device_id"),
                "report_date",
                "score",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("device_id", "report_date").agg(
        F.max("score").alias("score")
    )


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark()
    shutil.rmtree(WORK, ignore_errors=True)
    for mult in mults:
        src = batch(spark, mult)
        n = src.count()  # materialize the plan cost out of the timings

        # -- full: merge_upsert as shipped -----------------------------
        t = VersionedTable(
            spark, os.path.join(WORK, f"full-{mult}"), partition_by=["report_date"]
        )
        t.create(src.limit(1000))
        t0 = time.perf_counter()
        t.merge_upsert(src, keys=["device_id", "report_date"])
        full_s = time.perf_counter() - t0

        # -- no_sidecar: pre-round-10 counterfactual -------------------
        t2 = VersionedTable(
            spark, os.path.join(WORK, f"nosc-{mult}"), partition_by=["report_date"]
        )
        t2.create(src.limit(1000))
        cur = t2.current_version()
        prev = t2._load_manifest(cur)["files"]
        t0 = time.perf_counter()
        target = t2._read_files(prev)
        kept = target.join(
            src.select("device_id", "report_date").distinct(),
            ["device_id", "report_date"],
            "left_anti",
        )
        merged = kept.unionByName(src.select(*kept.columns))
        t2._commit(
            "merge_upsert", t2._write_new_files(merged), cur, "main", extra={}
        )
        nosc_s = time.perf_counter() - t0

        # -- sidecar_only: the bare distinct + parquet write -----------
        t0 = time.perf_counter()
        src.select("device_id", "report_date").distinct().write.parquet(
            os.path.join(WORK, f"sconly-{mult}", uuid.uuid4().hex)
        )
        sconly_s = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "mult": mult,
                    "batch_rows": n,
                    "full_s": round(full_s, 3),
                    "no_sidecar_s": round(nosc_s, 3),
                    "sidecar_only_s": round(sconly_s, 3),
                    "overhead_pct": round(100 * (full_s - nosc_s) / nosc_s, 1),
                    "rows_per_s_full": int(n / full_s),
                }
            ),
            flush=True,
        )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
