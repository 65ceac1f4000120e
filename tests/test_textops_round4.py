"""Edge-case tests for the round-4 text ops: chunk-window math,
repetition fractions on crafted corpora, TF-IDF ranking determinism.
The cross-engine value parity rides on tests/test_oracle.py (the new
entries are auto-parametrized there)."""

import pytest

from datalakehouse_spark.operators.textstats import (
    chunk_token_windows,
    repetition_features,
    tfidf_top_terms,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_window_math(spark):
    # 80 tokens, window 32 stride 24 -> chunks at 0/24/48: sizes 32,32,32
    # 75 tokens -> chunks at 0/24/48: sizes 32,32,27
    # 10 tokens (< window) -> one partial chunk
    texts = [
        " ".join(f"t{i}" for i in range(80)),
        " ".join(f"t{i}" for i in range(75)),
        " ".join(f"t{i}" for i in range(10)),
    ]
    out = {
        (r.doc_id, r.chunk_idx): r.n_chunk_tokens
        for r in chunk_token_windows(_docs(spark, texts)).collect()
    }
    assert out == {
        (0, 0): 32, (0, 1): 32, (0, 2): 32,
        (1, 0): 32, (1, 1): 32, (1, 2): 27,
        (2, 0): 10,
    }


def test_chunk_coverage_and_overlap(spark):
    # every token index must be covered; consecutive chunks overlap by 8
    n = 61
    doc = _docs(spark, [" ".join(f"t{i}" for i in range(n))])
    rows = chunk_token_windows(doc, window=32, stride=24).collect()
    covered = set()
    for r in rows:
        start = r.chunk_idx * 24
        covered |= set(range(start, start + r.n_chunk_tokens))
    assert covered == set(range(n))


def test_chunk_rejects_bad_stride(spark):
    with pytest.raises(AssertionError):
        chunk_token_windows(_docs(spark, ["a b"]), window=4, stride=8)


def test_repetition_fractions(spark):
    # "aa bb aa bb aa": 5 tokens, 2 distinct -> dup 0.6;
    # bigrams: (aa bb)x2, (bb aa)x2 -> top 2/4 = 0.5 -> reject
    # all-distinct 12-token doc: dup 0, top bigram 1/11 < 0.18 -> keep
    distinct_doc = " ".join(f"w{i}" for i in range(12))
    rows = {
        r.doc_id: r
        for r in repetition_features(
            _docs(spark, ["aa bb aa bb aa", distinct_doc])
        ).collect()
    }
    r0 = rows[0]
    assert r0.n_tokens == 5 and r0.n_bigrams == 4 and r0.top_bigram_n == 2
    assert r0.dup_token_frac == pytest.approx(0.6)
    assert r0.top_bigram_frac == pytest.approx(0.5)
    assert not r0.keep
    r1 = rows[1]
    assert r1.dup_token_frac == 0.0 and r1.top_bigram_n == 1
    assert r1.keep


def test_tfidf_ranks_rare_terms_first(spark):
    # 'rare' appears only in doc 0; 'common' in all docs. Within doc 0
    # equal tf -> the rarer term must outrank the common one.
    texts = ["rare common", "common filler", "common other"]
    rows = [
        r
        for r in tfidf_top_terms(_docs(spark, texts), n_docs=3, k=2).collect()
        if r.doc_id == 0
    ]
    by_rank = {r.rnk: r for r in rows}
    assert by_rank[1].term == "rare" and by_rank[1].df_docs == 1
    assert by_rank[2].term == "common" and by_rank[2].df_docs == 3
    assert by_rank[1].tfidf > by_rank[2].tfidf


def test_tfidf_tie_breaks_on_term(spark):
    # identical tf and df -> deterministic lexicographic tie-break
    rows = tfidf_top_terms(_docs(spark, ["zz aa mm"]), n_docs=1, k=3).collect()
    assert [r.term for r in sorted(rows, key=lambda r: r.rnk)] == ["aa", "mm", "zz"]


def test_rocksdb_knob_scopes_and_restores(spark):
    from datalakehouse_spark.streaming.jobs import ROCKSDB_PROVIDER, drain_confs

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key)
    with drain_confs(spark, state_store="rocksdb"):
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
    assert spark.conf.get(key) == before
