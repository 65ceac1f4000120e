"""Distributed BPE vocabulary-merge trainer (round 14).

Extension surface beyond the reference (BASELINE.json north_star,
SURVEY §0's LLM-extension mandate): the iterative pair-count → merge →
re-symbolize loop every subword tokenizer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" —
public) trains with, expressed as a distributed aggregation loop.

Algorithm (the classic trainer, on the word-frequency table):

1. Pre-tokenize the corpus into words and aggregate to ``(word,
   freq)`` — ONE shuffle over the corpus; every later iteration runs
   over the much smaller distinct-word table.  This is the same
   factoring real trainers (subword-nmt, HF tokenizers) use, and it is
   the 100 TB shape: a 100 TB corpus has a bounded distinct-word set.
2. Symbolize each word as its character array (no end-of-word marker —
   word-internal merges only; the convention is pinned by the oracle).
3. Per merge iteration: count every ADJACENT SYMBOL PAIR weighted by
   word frequency (map-side partial aggregation — ``zip_with`` over the
   symbol array, one hash aggregate), take the argmax with a total
   deterministic tie-break (freq DESC, pair ASC — binary string order
   on the pair key), then apply the merge GREEDILY LEFT-TO-RIGHT in
   every word via a JVM-side ``aggregate`` fold (``'aaa'`` + merge
   ``(a,a)`` → ``[aa, a]``), and truncate lineage with
   ``localCheckpoint`` (the house iterative pattern, operators/
   graph.py).  The ONLY driver-side data is the 1-row argmax per
   iteration and the ≤ ``n_merges``-sized merge table — never a token
   table.
4. Stop at ``n_merges`` merges, or earlier when the best pair's
   frequency drops below ``min_freq`` (or no pairs remain).

``apply_merges`` replays a learned merge list over new text — the
tokenizer side.  Application is embarrassingly parallel (Arrow-batched
``mapInPandas``; the merge list is a tiny closure constant), and the
greedy fold per merge is bit-identical to the trainer's, so the DuckDB
oracle can replay BOTH with the same recursive-CTE state machine
(the ``wav_codec_decode`` stateful-oracle pattern, registry_ext6.py).

Scale posture: step 1 is the only corpus-wide shuffle; each iteration
is a narrow map + one hash aggregate over the word table + a 1-row
collect; merge application is a pure map stage.  At 1000 executors the
word table partitions by word hash and every stage stays balanced —
pair keys are diverse (no skew), and the fold is whole-stage-codegen
JVM work, not Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: pair-key separator: sorts below every printable symbol, so the
#: (freq DESC, pair ASC) tie-break is identical in Spark and DuckDB
#: (both compare binary UTF-8).
PAIR_SEP = "\x01"

#: the word alphabet the trainer accepts — keeping symbols in [a-z]
#: makes merged-symbol literals safe to inline in SQL expressions and
#: keeps Spark/DuckDB string comparison trivially identical (ASCII).
WORD_PATTERN = "[a-z]+"


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 12,
) -> DataFrame:
    """Corpus → ``(w, f)`` word-frequency table (the one corpus-wide
    shuffle).  Words are lowercased ``[a-z]+`` runs with length in
    ``[min_len, max_len]`` — the bounded-alphabet contract above."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_PATTERN}', 0)")
            ).alias("w")
        )
        .where(F.length("w").between(min_len, max_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )


def _merge_fold_expr(left: str, right: str) -> str:
    """SQL for the greedy left-to-right merge of pair ``(left,
    right)`` over ``syms`` — an ``aggregate`` fold whose accumulator
    is the merged prefix.  ``try_element_at`` keeps the empty-prefix
    probe ANSI-safe (returns NULL, which the AND treats as false)."""
    for s in (left, right):
        if not s or not all("a" <= c <= "z" for c in s):
            raise ValueError(f"merge symbol {s!r} outside the [a-z]+ alphabet")
    merged = left + right
    return (
        "aggregate(syms, CAST(array() AS array<string>), "
        "(acc, x) -> CASE WHEN size(acc) > 0 "
        f"AND try_element_at(acc, -1) = '{left}' AND x = '{right}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}')) "
        "ELSE concat(acc, array(x)) END)"
    )


#: adjacent-pair extraction over ``syms`` weighted by ``f``:
#: zip_with over the two length-(n-1) slices — empty (never negative)
#: for one-symbol words, so no sequence(1,0) descending trap.
_PAIRS_EXPR = (
    "zip_with(slice(syms, 1, size(syms) - 1), "
    "slice(syms, 2, size(syms) - 1), "
    f"(a, b) -> concat(a, '{PAIR_SEP}', b))"
)


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 24,
    min_freq: int = 2,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Train ``n_merges`` BPE merges over a ``(w, f)`` word-frequency
    table.  Returns ``(merge_table_df, merges)`` where the DataFrame
    has ``(rank, left, right, merged, pair_freq)`` ordered by rank and
    ``merges`` is the same content as a driver-side list (bounded by
    ``n_merges`` — the vocabulary, not a token table).

    ``checkpoint_every``: materialize the re-symbolized word table
    every N merges (``localCheckpoint``, the house iterative pattern).
    1 (the default) is the cluster-scale choice — each iteration's
    fold runs once, total work O(merges x words).  0 never
    checkpoints: Catalyst collapses the pending folds into one nested
    projection re-evaluated per argmax (O(merges² x words) compute but
    ``merges`` fewer jobs) — the right trade for small/bounded word
    tables where per-job scheduling dominates, e.g. the oracle
    fixture.

    Empty words are dropped up front (ADVICE r14): ``word_frequencies``
    can't produce them, but the public API accepts any ``(w, f)``
    table, and a zero-length word would turn the pair slice into a
    negative-length ``slice(syms, 1, -1)`` that fails with an opaque
    Spark runtime error mid-iteration instead of simply contributing
    nothing (which is what an empty word means to a pair counter)."""
    words = words.where(F.length("w") > 0)
    cur = words.select(
        F.expr("filter(split(w, ''), s -> s != '')").alias("syms"),
        F.col("f").cast("long").alias("f"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        best = (
            cur.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "f")
            .groupBy("p")
            .agg(F.sum("f").alias("c"))
            .orderBy(F.desc("c"), F.asc("p"))
            # 1-row argmax collect per iteration — the documented
            # bounded driver-side surface of the trainer loop
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_freq:
            break
        left, right = best[0]["p"].split(PAIR_SEP)
        merges.append((left, right, int(best[0]["c"])))
        cur = cur.select(
            F.expr(_merge_fold_expr(left, right)).alias("syms"), "f"
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)

    rows = [
        (i + 1, left, right, left + right, freq)
        for i, (left, right, freq) in enumerate(merges)
    ]
    out = spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_freq long"
    )
    return out.orderBy("rank"), merges


def train_merges_local(
    word_freqs: list[tuple[str, int]], n_merges: int, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    """The same trainer over an in-memory word-frequency list: greedy
    fold, (freq DESC, pair ASC on the separator-joined key) argmax,
    min-freq stop — bit-identical to the distributed loop (pinned by
    tests/test_bpe.py).  Used executor-side by ``bpe_train_auto``'s
    small-table path; never called on the driver with corpus data."""
    words = [(list(w), f) for w, f in word_freqs]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[str, int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                key = a + PAIR_SEP + b
                counts[key] = counts.get(key, 0) + f
        if not counts:
            break
        best_key = min(counts, key=lambda k: (-counts[k], k))
        if counts[best_key] < min_freq:
            break
        left, right = best_key.split(PAIR_SEP)
        merges.append((left, right, counts[best_key]))
        words = [
            (apply_merges(syms, [(left, right)]), f) for syms, f in words
        ]
    return merges


def bpe_train_auto(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 24,
    min_freq: int = 2,
    local_rows_threshold: int = 65536,
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Size-adaptive trainer (the ntile_percent_rank pattern: pick the
    plan by measured input size).  A word table at or under
    ``local_rows_threshold`` rows trains inside ONE executor task
    (``coalesce(1).mapInPandas`` running ``train_merges_local``) — one
    Spark job instead of O(merges), which is the right trade when the
    table is fixture-/vocabulary-sized and per-job scheduling dominates.
    Larger tables take the distributed iteration loop (``bpe_train``).
    Both paths run the identical algorithm; the contract test compares
    them on the same inputs.

    The size probe is FUSED into the train job (VERDICT r14 #1): the
    single task either trains (it consumed the whole table) or, the
    moment it has seen threshold + 1 rows, emits a ``rank = -1``
    sentinel row and STOPS CONSUMING its input (generator early-exit —
    ``mapInPandas`` permits partial consumption, so the task never
    pulls more than one Arrow batch past the threshold), and the
    distributed loop takes over.  The cold path is therefore ONE
    Spark action over a NARROW plan (coalesce, no limit-shuffle, so
    AQE doesn't split it into stage-jobs) — the old shape ran a full
    ``count()`` job (recomputing the word-frequency pipeline), then
    the train job, then a checkpointed collect.  The returned merge
    table is built driver-side from the ≤ ``n_merges``-row collect
    (the documented bounded vocab surface), so no extra job
    materializes it."""
    schema = (
        "rank int, left string, right string, merged string, pair_freq long"
    )
    cols = ["rank", "left", "right", "merged", "pair_freq"]
    threshold = local_rows_threshold

    def train_batches(it):
        import pandas as _pd

        wf: list[tuple[str, int]] = []
        for pdf in it:
            wf.extend(zip(pdf["w"], (int(v) for v in pdf["f"])))
            if len(wf) > threshold:
                # sentinel: table exceeds the single-task budget — the
                # driver falls back to the distributed iteration loop
                yield _pd.DataFrame([(-1, "", "", "", 0)], columns=cols)
                return
        rows = [
            (i + 1, left, right, left + right, freq)
            for i, (left, right, freq) in enumerate(
                train_merges_local(wf, n_merges, min_freq)
            )
        ]
        yield _pd.DataFrame(rows, columns=cols)

    probe = (
        words.where(F.length("w") > 0)
        .select("w", F.col("f").cast("long").alias("f"))
        .coalesce(1)
        .mapInPandas(train_batches, schema=schema)
        .collect()
    )
    if probe and probe[0]["rank"] == -1:
        return bpe_train(spark, words, n_merges=n_merges, min_freq=min_freq)
    merges = [
        (r["left"], r["right"], int(r["pair_freq"]))
        for r in sorted(probe, key=lambda r: r["rank"])
    ]
    rows = [
        (i + 1, left, right, left + right, freq)
        for i, (left, right, freq) in enumerate(merges)
    ]
    out = spark.createDataFrame(rows, schema)
    return out.orderBy("rank"), merges


def apply_merges(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Replay a merge list over one symbol sequence, in rank order,
    each merge applied greedily left-to-right — bit-identical to the
    trainer fold (and to the oracle's recursive replay)."""
    for left, right in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_tokenize_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 2,
    max_len: int = 12,
) -> DataFrame:
    """Per-document tokenization stats under a learned merge list:
    ``(doc_id, n_words, n_chars, n_tokens)`` where ``n_chars`` is the
    pre-merge symbol count and ``n_tokens`` the post-merge count.
    Arrow-batched ``mapInPandas``; the merge list rides the closure
    (bounded by the merge budget).  Genuinely sequential per word —
    the honest Python tier — but embarrassingly parallel over rows.

    Two bit-exact fast paths (round 16): a per-task DISTINCT-WORD memo
    (word frequencies are Zipfian — most replays repeat), and a
    per-word merge PREFILTER: symbols are always contiguous slices of
    the original word (merging concatenates neighbors, never reorders),
    so a merge ``(l, r)`` can only ever fire when ``l + r`` occurs in
    the word — the rank fold skips the rest.  Neither changes a single
    output: the memo caches the identical count and the prefilter drops
    only merges whose greedy pass provably matches nothing."""
    import re as _re

    pairs = [(left, right) for left, right, *_ in merges]
    pattern = WORD_PATTERN
    lo, hi = min_len, max_len

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def batches(it):
        import pandas as _pd

        rx = _re.compile(pattern)
        memo: dict[str, int] = {}

        def ntok(w: str) -> int:
            if w not in memo:
                applicable = [p for p in pairs if p[0] + p[1] in w]
                memo[w] = len(apply_merges(list(w), applicable))
            return memo[w]

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [
                    w
                    for w in rx.findall((text or "").lower())
                    if lo <= len(w) <= hi
                ]
                n_chars = sum(len(w) for w in words)
                n_tokens = sum(ntok(w) for w in words)
                rows.append((doc_id, len(words), n_chars, n_tokens))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_chars", "n_tokens"]
            )

    return src.mapInPandas(
        batches, schema="doc_id long, n_words int, n_chars int, n_tokens int"
    )
