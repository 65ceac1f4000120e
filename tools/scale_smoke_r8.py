#!/usr/bin/env python
"""Round-8 scale-trend smoke for the operators this round changed:

- **global ranking** (`with_global_rank`, now driver-sampled literal
  splits): per-user revenue rank over the events corpus — the
  gini/ntile shape.  rows/s must hold or rise with corpus growth: the
  two small eager jobs are O(corpus scan) and the ranking window is
  partitioned by bucket, so nothing is single-task.
- **single-scan decontamination** (`decontamination_flags`): the
  persisted tagged gram frame — docs/s must hold (one tokenization
  pass + broadcast semi-join regardless of corpus size).
- **star-contraction CC** (`_star_contraction`): the escalation path —
  a path graph (worst diameter) of nodes ∝ multiplier; O(log²) rounds
  of keyed joins, so nodes/s must hold or rise.

Usage: python tools/scale_smoke_r8.py [mults...]   (default 1 4 16)
Appends nothing; prints one JSON line per multiplier for manual entry
into docs/SCALING_RESULTS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import BASE_SF, synthesize  # noqa: E402


def run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def measure(spark, sf_dir: str, mult: int) -> dict:
    from datalakehouse_spark.operators.dedup import (
        _star_contraction,
        decontamination_flags,
    )
    from datalakehouse_spark.operators.ranking import with_global_rank

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    n_ev, n_docs = ev.count(), docs.count()
    out = {"rows_events": n_ev, "rows_docs": n_docs}

    # gini shape: corpus scan -> user aggregate -> distributed global rank
    ltv = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("y")
    )
    t0 = time.perf_counter()
    ranked = with_global_rank(ltv, [("y", True), ("user_id", True)], rank_col="i")
    t = run(ranked.agg(F.count(F.lit(1)), F.sum("i")))
    t_total = time.perf_counter() - t0  # includes the two eager jobs
    out["global_rank_s"] = round(t_total, 2)
    out["global_rank_rows_per_s"] = int(n_ev / t_total)

    t0 = time.perf_counter()
    # eager: materializes + releases its gram cache internally
    flags = decontamination_flags(docs, F.col("doc_id") % 50 == 0)
    run(flags)  # count of the checkpointed doc-level frame (cheap)
    t = time.perf_counter() - t0
    out["decon_s"] = round(t, 2)
    out["decon_docs_per_s"] = int(n_docs / t)

    # path graph: worst-case diameter for the contraction
    n_nodes = 100_000 * mult
    pairs = spark.range(n_nodes - 1).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("d")
    )
    t0 = time.perf_counter()
    labels = _star_contraction(pairs)
    distinct = labels.select("label").distinct().count()
    t = time.perf_counter() - t0
    assert distinct == 1, f"chain must contract to one component, got {distinct}"
    out["starcc_nodes"] = n_nodes
    out["starcc_s"] = round(t, 2)
    out["starcc_nodes_per_s"] = int(n_nodes / t)
    return out


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale_smoke_r8")
    spark.sparkContext.setLogLevel("ERROR")
    for m in mults:
        sf_dir = BASE_SF if m == 1 else synthesize(spark, m)
        r = measure(spark, sf_dir, m)
        print(json.dumps({"mult": m, **r}))


if __name__ == "__main__":
    main()
