#!/usr/bin/env python
"""64x scale extension for the two steepest absolute growers in
docs/SCALING_RESULTS.md — `near_dup_pairs` (banded MinHash-LSH) and
`shingle_novelty_daily` (hashed-shingle novelty).

Two corpus-growth modes, measured separately because they answer
different questions:

- **realistic** (more duplicate FAMILIES, constant family size): each
  synthetic copy appends its copy index to every token, so cross-copy
  shingle overlap collapses while token counts and the true near-dup
  structure per document stay what they were at 1x.  This is how a
  crawl actually grows, and it is the plan-scalability criterion:
  docs/s must hold or rise.
- **adversarial** (family size == multiplier, `scale_smoke.synthesize`'s
  " v{i}" suffix keeps copies mutually near-dup): the TRUE pair output
  grows quadratically in the multiplier (64-doc families emit 2,016
  pairs each), so docs/s necessarily falls — the honest metric is
  verified PAIRS/s, which must hold (the pipeline is output-bound, not
  corpus²-bound).

Usage: python tools/scale_smoke64.py [mults...]   (default 16 64)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import BASE_SF, WORK, synthesize  # noqa: E402


def synthesize_distinct(spark, mult: int) -> str:
    """N families per base document instead of one N-doc family: the
    copy index is appended to EVERY token, so every shingle differs
    across copies while token count and each copy's INTERNAL duplicate
    structure are unchanged (an earlier draft inserted an extra token
    per gap, which doubled the shingle workload and conflated doc-length
    growth with corpus growth)."""
    out = f"{WORK}/x{mult}_distinct2"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    docs = load_table(spark, BASE_SF, "documents")
    n_d = docs.count()
    copies = None
    for i in range(mult):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * n_d)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", "$1" + format(i, "x")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        copies = c if copies is None else copies.unionByName(c)
    copies.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [16, 64]
    spark = get_spark("scale_smoke64")
    spark.sparkContext.setLogLevel("ERROR")

    from datalakehouse_spark.operators.dedup import near_dup_pairs
    from datalakehouse_spark.registry import REGISTRY, _load_extensions

    _load_extensions()
    novelty_fn = REGISTRY["shingle_novelty_daily"].fn

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    real_rows = []
    for m in mults:
        sf_dir = synthesize_distinct(spark, m)
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        nd = run(near_dup_pairs(docs))
        nv = run(novelty_fn(spark, sf_dir))
        real_rows.append((m, n_docs, nd, int(n_docs / nd), nv, int(n_docs / nv)))
        print(
            f"[realistic] mult={m} docs={n_docs} near_dup_s={nd:.2f} "
            f"({int(n_docs/nd):,}/s) novelty_s={nv:.2f} ({int(n_docs/nv):,}/s)"
        )

    adv_rows = []
    for m in mults:
        sf_dir = BASE_SF if m == 1 else synthesize(spark, m)
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        t0 = time.perf_counter()
        n_pairs = near_dup_pairs(docs).count()
        nd = time.perf_counter() - t0
        adv_rows.append((m, n_docs, nd, int(n_docs / nd), n_pairs, int(n_pairs / nd)))
        print(
            f"[adversarial] mult={m} docs={n_docs} near_dup_s={nd:.2f} "
            f"pairs={n_pairs:,} ({int(n_pairs/nd):,} pairs/s)"
        )

    lines = [
        "",
        "## 64x extension (steepest 16x growers, both corpus-growth modes)",
        "",
        "Realistic growth (more duplicate families, constant family size —",
        "the copy index rides every token, token counts unchanged): the",
        "plan-scalability criterion, docs/s must hold or rise.",
        "",
        "| mult | docs | near-dup s | docs/s | novelty s | docs/s |",
        "|---|---|---|---|---|---|",
    ]
    for m, n, nd, ndr, nv, nvr in real_rows:
        lines.append(f"| {m}x | {n:,} | {nd:.2f} | {ndr:,} | {nv:.2f} | {nvr:,} |")
    lines += [
        "",
        "Adversarial growth (family size == multiplier, the synthesize()",
        "\" v{i}\" suffix keeps all copies mutually near-dup): the true pair",
        "output grows quadratically in the multiplier — a 64x corpus holds",
        "64-doc families emitting 2,016 true pairs each — so the honest",
        "throughput metric is verified pairs/s (output-bound), not docs/s.",
        "",
        "| mult | docs | near-dup s | docs/s | true pairs | pairs/s |",
        "|---|---|---|---|---|---|",
    ]
    for m, n, nd, ndr, np_, npr in adv_rows:
        lines.append(
            f"| {m}x | {n:,} | {nd:.2f} | {ndr:,} | {np_:,} | {npr:,} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "docs", "SCALING_RESULTS.md"), "a") as fh:
        fh.write("\n".join(lines))
    print("appended to docs/SCALING_RESULTS.md")


if __name__ == "__main__":
    main()
