"""Text-analysis operators for LLM training-data pipelines.

Extension surface beyond the reference (BASELINE.json north_star): the
operations a 100 TB web-text curation pipeline runs over a `documents`
table — tokenization stats, quality scoring, language identification,
document fingerprinting.

Scale posture: everything here is built-in Catalyst expressions over
strings/arrays (split / regexp / transform / aggregate) — no Python in
the hot path, fully parallel, no shuffle except the final aggregates a
caller adds.  At 100 TB these run as a single narrow map stage fused
into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalakehouse_spark.functions.hashing import java_hashcode

#: BPE-ish word/number/punct token pattern (shared with the DuckDB oracle —
#: keep it to the regex subset both engines interpret identically).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword lists for the n-gram/stopword langid
#: heuristic. Deliberately small and fixed: the operator contract is
#: deterministic scoring, not linguistic completeness.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "zu"),
    "fr": ("le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (lowercased)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex token stream approximating a BPE pre-tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of `lang`."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def langid_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-hit ratio per candidate language."""
    return {lang: stopword_ratio(col, lang) for lang in STOPWORDS}


def langid(col: Column | str, min_ratio: float = 0.05) -> Column:
    """Argmax-by-stopword-ratio language ID; 'und' below threshold.

    Ties break by language-code order (deterministic — required for the
    oracle hash-compare and for reproducible pipeline runs).

    Expression form (tokenizes once per language ratio) — prefer
    :func:`langid_df` in pipelines, which stages the token array once.
    """
    scores = langid_scores(col)
    return _argmax_lang(scores, min_ratio)


def _argmax_lang(scores: dict[str, Column], min_ratio: float) -> Column:
    best_lang = F.lit("und")
    best_score = F.lit(float(min_ratio))
    # fold in reverse-alphabetical order so the earliest language wins ties
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    return best_lang


def langid_df(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    min_ratio: float = 0.05,
) -> DataFrame:
    """Staged language ID: tokenize ONCE, derive every language's
    stopword ratio from the materialized array, fold the argmax.
    Identical semantics to :func:`langid`; O(langs) fewer splits."""
    staged = df.withColumn("_toks", tokens(text_col))
    scores = {
        lang: _stopword_ratio_of(F.col("_toks"), lang) for lang in STOPWORDS
    }
    return staged.withColumn(out_col, _argmax_lang(scores, min_ratio)).drop("_toks")


def _stopword_ratio_of(toks: Column, lang: str) -> Column:
    """Stopword-hit ratio from an already-materialized token column."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach deterministic quality features:

    - n_chars_obs, n_tokens (whitespace), n_unique_tokens
    - mean_token_len
    - punct_ratio / digit_ratio / upper_ratio (per char)
    - stopword_ratio_en

    The token array is STAGED through its own projection: four feature
    columns consume it, and an inline ``tokens(text)`` expression would
    re-run the split per column (higher-order lambdas are interpreted,
    no common-subexpression elimination across columns).
    """
    c = F.col(text_col)
    staged = df.withColumn("_toks", tokens(text_col))
    toks = F.col("_toks")
    n_chars = F.length(c)
    safe_chars = F.greatest(n_chars, F.lit(1))
    n_tokens = F.size(toks)
    return staged.select(
        *df.columns,
        n_chars.alias("n_chars_obs"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
            / F.greatest(n_tokens, F.lit(1))
        ).alias("mean_token_len"),
        (
            F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) / safe_chars
        ).alias("punct_ratio"),
        (F.length(F.regexp_replace(c, r"[^0-9]", "")) / safe_chars).alias("digit_ratio"),
        _stopword_ratio_of(toks, "en").alias("stopword_ratio_en"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score from the features (weights fixed).

    Mirrors the shape of published web-text quality filters (length
    band + lexical diversity + stopword presence − punctuation excess);
    the exact weights are this engine's contract, asserted by the
    oracle twin.
    """
    feats = quality_features(df, text_col)
    length_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0).otherwise(
        0.2
    )
    diversity = F.col("n_unique_tokens") / F.greatest(F.col("n_tokens"), F.lit(1))
    score = (
        F.lit(0.3) * length_ok
        + F.lit(0.3) * diversity
        + F.lit(0.3) * F.least(F.col("stopword_ratio_en") * 4, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0)))
    )
    return feats.withColumn("quality_score", F.round(score, 6))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: java-hash polynomial over the
    whitespace-normalized, lowercased text (32-bit signed)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return java_hashcode(normalized)


# ---------------------------------------------------------------------------
# Round-4 training-data pipeline ops: chunking, repetition filters, TF-IDF
# ---------------------------------------------------------------------------


def chunk_token_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into overlapping fixed-size
    windows — the standard pre-training chunker (context-window packing
    with overlap so no boundary context is lost).

    Layout: chunk ``i`` covers tokens ``[i*stride, i*stride + window)``;
    the chunk count ``1 + ceil(max(n - window, 0) / stride)`` covers
    every token.  All integer math (no float ceil) so the DuckDB oracle
    replays it exactly.

    Scale posture: one narrow projection + a bounded ``sequence`` →
    ``explode`` fan-out of ≤ n/stride+1 rows per doc, fused into the
    scan — no shuffle, no Python.  At 100 TB the output partitioning
    inherits the input's, which is what a downstream tokenizer wants.
    """
    assert 0 < stride <= window, "stride must be in (0, window]"
    staged = df.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    with_count = staged.withColumn(
        "_n_chunks",
        F.lit(1)
        + F.expr(f"(greatest(_n - {window}, 0) + {stride - 1}) div {stride}").cast("int"),
    )
    chunks = with_count.select(
        F.col(id_col),
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias("chunk_idx"),
    )
    piece = F.expr(f"slice(_toks, chunk_idx * {stride} + 1, {window})")
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(piece).alias("n_chunk_tokens"),
        F.length(F.concat_ws(" ", piece)).alias("chunk_chars"),
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and most-frequent-bigram fraction, plus the keep/reject
    verdict at the published-filter-shaped thresholds (dup_token_frac
    ≤ 0.30, top_bigram_frac ≤ 0.18).

    Docs with fewer than two tokens have no bigram and drop out (the
    fixture floor is 10 tokens); both engines share that contract.

    Scale posture: explode keyed by (doc, bigram) → two hash aggregates
    whose keys start with the doc id — partial aggregation map-side,
    shuffle bounded by distinct bigrams per doc, never a self-join.
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks")).select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        (
            F.lit(1.0) - F.size(F.array_distinct("_toks")) / F.size("_toks")
        ).alias("dup_token_frac"),
        # zip_with over two slices, NOT transform(sequence, i -> _toks[i]):
        # project collapsing may inline the split() behind _toks into the
        # lambda, and an indexed-access lambda then re-tokenizes the doc
        # PER ELEMENT (O(n²·len) — measured 5.7 s vs 0.3 s at sf0.1).
        # With slices the inlined split costs once per row reference.
        F.expr(
            "zip_with(slice(_toks, 1, size(_toks) - 1),"
            "         slice(_toks, 2, size(_toks) - 1),"
            "         (a, b) -> concat(a, ' ', b))"
        ).alias("_bigrams"),
    )
    exploded = base.select(
        id_col, "n_tokens", "dup_token_frac", F.explode("_bigrams").alias("bg")
    )
    per_bigram = exploded.groupBy(id_col, "n_tokens", "dup_token_frac", "bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_bigram.groupBy(id_col, "n_tokens", "dup_token_frac").agg(
        F.max("c").alias("top_bigram_n"), F.sum("c").cast("bigint").alias("n_bigrams")
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        "top_bigram_n",
        "n_bigrams",
        (F.col("top_bigram_n") / F.col("n_bigrams")).alias("top_bigram_frac"),
        (
            (F.col("dup_token_frac") <= 0.30)
            & ((F.col("top_bigram_n") / F.col("n_bigrams")) <= 0.18)
        ).alias("keep"),
    )


def tfidf_top_terms(
    df: DataFrame,
    n_docs: int,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    The idf uses the RATIONAL form ``(N+1)/(df+1)`` instead of its log:
    log is monotone, so the per-doc ranking is identical, and the
    compared values stay plain double divisions that both engines
    compute bit-identically (``ln`` is only ~1-ulp accurate and differs
    between libm and the JVM — a cross-engine tie-break hazard).

    ``n_docs`` is passed in by the caller (one count() job — a scalar,
    same class as IVF's collected centroids).

    Scale posture: tf aggregate keyed (doc, term); df aggregate keyed
    (term) derived from tf's output (already deduped per doc, so
    ``count(*)`` IS the document frequency — no countDistinct); the
    df join shuffles on term.  Ranking is a bounded per-doc window.
    """
    ex = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = ex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df_docs"))
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df_docs",
        (F.col("tf") * (F.lit(float(n_docs + 1)) / (F.col("df_docs") + F.lit(1)))).alias(
            "tfidf"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df_docs", "tfidf", F.col("rnk").cast("int").alias("rnk"))
    )


def sequence_pack_assignments(
    df: DataFrame,
    seq_len: int = 512,
    stream_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pre-training sequence packing: concatenate each stream's docs in
    id order and cut the token tape every ``seq_len`` tokens; report the
    sequence span each document lands in (docs straddle boundaries —
    the standard packed-pretraining layout, no padding waste).

    Output per doc: token count, the stream-local cumulative token
    offset, and first/last packed-sequence index.

    Scale posture: one window cumsum PARTITIONED BY the stream column —
    streams pack independently and in parallel, no global total order.
    At 100 TB with few giant streams, sub-split the stream key (e.g.
    ``(source, doc_id div B)``) and stitch offsets with a per-substream
    base — same plan shape, finer parallelism.
    """
    from pyspark.sql import Window

    t = df.select(
        F.col(stream_col), F.col(id_col), F.size(tokens(text_col)).alias("n_tokens")
    )
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = t.withColumn("_cum", F.sum("n_tokens").over(w))
    return staged.select(
        stream_col,
        id_col,
        "n_tokens",
        (F.col("_cum") - F.col("n_tokens")).alias("tok_offset"),
        F.expr(f"(_cum - n_tokens) div {seq_len}").alias("first_seq"),
        F.expr(f"(_cum - 1) div {seq_len}").alias("last_seq"),
        (
            F.expr(f"(_cum - 1) div {seq_len}")
            - F.expr(f"(_cum - n_tokens) div {seq_len}")
            + F.lit(1)
        ).alias("n_seqs"),
    )
