#!/usr/bin/env python
"""Tokenizer-RUNTIME throughput ladder (round 16, VERDICT r15 #4).

The three subword runtimes (BPE merge replay, WordPiece longest-match,
Unigram-LM enumeration argmax) are Arrow-batched per-word Python —
the honest tier absent a native tokenizer library — and they are the
slowest per-core code in the engine.  This ladder measures what the
100 TB story needs stated: **tokens/s/core**, and whether it HOLDS as
the corpus multiplies (it must — tokenization is a pure map stage with
no shuffle; a falling per-core rate would mean a closure/serialization
bottleneck, not a data one).

Method: each runtime trains once on the 1x fixture (vocab is
corpus-bounded, not corpus-proportional), then tokenizes the N×
synthesized corpus repartitioned to exactly the session's cores so
rate / cores is a true per-core number.  The emitted token count is
the work metric (tokens/s), with words/s alongside.

Usage: python tools/scale_smoke_tokenize.py [mults...]   (default 1 4 16)
Results land in docs/SCALING_RESULTS.md; the production-swap guidance
(when a native tokenizer library replaces this tier) is in
docs/SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.operators import bpe as B  # noqa: E402
from datalakehouse_spark.operators import unigram as U  # noqa: E402
from datalakehouse_spark.operators import wordpiece as W  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import BASE_SF, synthesize  # noqa: E402

N_MERGES = 16


def run(mults: list[int]) -> None:
    spark = get_spark("scale_smoke_tokenize")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    # --- train each vocabulary once on the 1x corpus (bounded) ---
    wf = (
        B.word_frequencies(load_table(spark, BASE_SF, "documents"))
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(512)
    )
    _, bpe_merges = B.bpe_train_auto(spark, wf, n_merges=N_MERGES)
    _, wp_merges = W.wordpiece_train_auto(spark, wf, n_merges=N_MERGES)
    wp_pieces = {left + right for left, right, *_ in wp_merges}
    wf8 = (
        B.word_frequencies(load_table(spark, BASE_SF, "documents"), max_len=8)
        .orderBy(F.desc("f"), F.asc("w"))
        .limit(512)
    )
    _, uni_inv = U.unigram_train_auto(spark, wf8)

    runtimes = {
        "bpe_replay": lambda d: B.bpe_tokenize_stats(
            d, [(l, r) for l, r, *_ in bpe_merges]
        ),
        "wordpiece_longest_match": lambda d: W.wordpiece_tokenize_stats(
            d, wp_pieces
        ),
        "unigram_enum_argmax": lambda d: U.unigram_tokenize_stats(
            d, uni_inv
        ),
    }

    print(f"## tokenizer runtime throughput ({cores} cores)", flush=True)
    print(
        "| runtime | mult | docs | words | tokens | secs | tokens/s |"
        " tokens/s/core |",
        flush=True,
    )
    print("|---|---|---|---|---|---|---|---|", flush=True)
    for m in sorted({1, *mults}):
        sf = BASE_SF if m == 1 else synthesize(spark, m)
        docs = (
            load_table(spark, sf, "documents")
            .select("doc_id", "text")
            .repartition(cores)
            .localCheckpoint(eager=True)  # isolate tokenize time
        )
        n_docs = docs.count()
        for name, fn in runtimes.items():
            t0 = time.time()
            agg = (
                fn(docs)
                .agg(
                    F.sum("n_words").alias("nw"),
                    F.sum("n_tokens").alias("nt"),
                )
                .collect()[0]
            )
            dt = time.time() - t0
            print(
                f"| {name} | {m}x | {n_docs:,} | {agg['nw']:,} |"
                f" {agg['nt']:,} | {dt:.2f} | {agg['nt'] / dt:,.0f} |"
                f" {agg['nt'] / dt / cores:,.0f} |",
                flush=True,
            )


if __name__ == "__main__":
    run([int(a) for a in sys.argv[1:]] or [1, 4, 16])
