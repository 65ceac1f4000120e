#!/usr/bin/env python
"""BPE-trainer scale ladder (round 14, VERDICT r13 #3).

Two axes, measured separately because they stress different stages:

- **corpus growth** (plain ``synthesize``: N× documents): stresses
  step 1, the one corpus-wide shuffle (``word_frequencies``).  The
  fixture corpus is templated (~30 distinct [a-z]{2,12} words at any
  sf), so this axis grows token VOLUME, not vocabulary.  Honest
  metric: corpus words/s through the frequency aggregation, which must
  hold or rise.
- **vocabulary growth**: the iteration loop consumes the (word, freq)
  table, so this axis grows THAT directly — the 1x table unioned N
  times with a distinct [a-z] suffix per copy (suffixing the corpus
  would be stripped by the word regex; building the table is the same
  input the loop would see from a diverse crawl).  Honest metric:
  (word-table rows × merges)/s over the distributed loop
  (``checkpoint_every=1``, the cluster default), which must hold or
  rise — a collapse would mean a driver-side or skew bottleneck.

Usage: python tools/scale_smoke_bpe.py [mults...]
       (default 64 1024 16384 for the vocabulary axis;
        corpus axis runs at min(mult, 16) to bound /tmp usage)
"""

from __future__ import annotations

import itertools
import os
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.operators.bpe import bpe_train, word_frequencies  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import BASE_SF, synthesize  # noqa: E402

N_MERGES = 8


def _suffixes():
    """aa, ab, ..., zz, aaa, ... — distinct all-letter suffixes."""
    for n in itertools.count(2):
        yield from (
            "".join(t) for t in itertools.product(string.ascii_lowercase, repeat=n)
        )


def grown_word_table(spark, mult: int):
    """The 1x word-frequency table replicated ``mult`` times, each copy
    suffixed with a distinct letter string — vocabulary grows ~mult×
    while the frequency distribution shape is preserved."""
    base = word_frequencies(load_table(spark, BASE_SF, "documents"))
    sufs = list(itertools.islice(_suffixes(), mult))
    suf_df = spark.createDataFrame([(s,) for s in sufs], "suf string")
    return base.crossJoin(F.broadcast(suf_df)).select(
        F.concat("w", "suf").alias("w"), "f"
    )


def run(mults: list[int]) -> None:
    spark = get_spark("scale_smoke_bpe")
    spark.sparkContext.setLogLevel("ERROR")

    print("## corpus growth (word_frequencies shuffle)", flush=True)
    print("| mult | corpus words | wf_s | corpus words/s |", flush=True)
    print("|---|---|---|---|", flush=True)
    for m in sorted({min(m, 16) for m in [1] + mults}):
        sf = BASE_SF if m == 1 else synthesize(spark, m)
        docs = load_table(spark, sf, "documents")
        t0 = time.time()
        wf = word_frequencies(docs).localCheckpoint(eager=True)
        agg = wf.agg(
            F.sum("f").alias("total"), F.count(F.lit(1)).alias("nw")
        ).collect()[0]
        dt = time.time() - t0
        print(
            f"| {m}x | {agg['total']:,} | {dt:.2f} | "
            f"{agg['total'] / dt:,.0f} |",
            flush=True,
        )

    print(flush=True)
    print(
        "## vocabulary growth (distributed merge loop, checkpoint_every=1)",
        flush=True,
    )
    print(
        f"| mult | word-table rows | train_s ({N_MERGES} merges) | "
        "(rows x merges)/s |",
        flush=True,
    )
    print("|---|---|---|---|", flush=True)
    for m in mults:
        wf = grown_word_table(spark, m).localCheckpoint(eager=True)
        nw = wf.count()
        t0 = time.time()
        _, merges = bpe_train(
            spark, wf, n_merges=N_MERGES, min_freq=2, checkpoint_every=1
        )
        dt = time.time() - t0
        print(
            f"| {m}x | {nw:,} | {dt:.2f} | {nw * len(merges) / dt:,.0f} |",
            flush=True,
        )


if __name__ == "__main__":
    run([int(a) for a in sys.argv[1:]] or [64, 1024, 16384])
