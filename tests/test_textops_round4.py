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


def test_connected_components_transitivity(spark):
    from datalakehouse_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0-1-2-3 (diameter > 1 forces multiple propagation rounds),
    # pair 5-6, singleton 4
    pairs = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (6, 5)], "id_a long, id_b long"
    )
    got = {r.id: r.label for r in connected_components(nodes, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5}


def test_dedup_clusters_groups_transitive_near_dups(spark):
    from datalakehouse_spark.operators.dedup import dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " lambda"),          # near-dup of 0
            (2, base + " lambda mu"),       # near-dup of 1 (and so of 0 transitively)
            (3, "completely different text with other words entirely here now"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup_clusters(docs).collect()}
    assert rows[0].cluster == rows[1].cluster == rows[2].cluster == 0
    assert rows[3].cluster == 3
    assert rows[0].is_canonical and not rows[1].is_canonical
    # one keeper per cluster
    keepers = [r for r in rows.values() if r.is_canonical]
    assert {r.doc_id for r in keepers} == {0, 3}


def test_sequence_packing_boundary_math(spark):
    from datalakehouse_spark.operators.textstats import sequence_pack_assignments

    # one stream, 3 docs of 300/300/300 tokens, seq_len 512:
    # doc0 [0,300) -> seq 0; doc1 [300,600) -> seqs 0-1; doc2 [600,900) -> 1
    docs = spark.createDataFrame(
        [(i, "web", " ".join(f"t{j}" for j in range(300))) for i in range(3)],
        "doc_id long, source string, text string",
    )
    rows = {r.doc_id: r for r in sequence_pack_assignments(docs, seq_len=512).collect()}
    assert (rows[0].first_seq, rows[0].last_seq, rows[0].n_seqs) == (0, 0, 1)
    assert (rows[1].first_seq, rows[1].last_seq, rows[1].n_seqs) == (0, 1, 2)
    assert (rows[2].first_seq, rows[2].last_seq, rows[2].n_seqs) == (1, 1, 1)
    assert rows[2].tok_offset == 600


def test_sequence_packing_streams_independent(spark):
    from datalakehouse_spark.operators.textstats import sequence_pack_assignments

    docs = spark.createDataFrame(
        [(0, "a", "x " * 20), (1, "b", "y " * 20)],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r for r in sequence_pack_assignments(docs, seq_len=16).collect()}
    # each stream starts its own tape at offset 0
    assert rows["a"].tok_offset == 0 and rows["b"].tok_offset == 0


def test_pagerank_hand_computed(spark):
    from datalakehouse_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(3)], "id long")
    # path graph 0-1-2: deg(0)=deg(2)=1, deg(1)=2
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    got = {
        r.id: r.rank for r in pagerank(nodes, pairs, iters=1, damping=0.85).collect()
    }
    # one iteration from rank=1: r(0)=r(2)=0.15+0.85*(1/2); r(1)=0.15+0.85*(1+1)... wait
    # contributions INTO 0: from 1 -> rank(1)/deg(1) = 1/2
    # into 1: from 0 (1/1) + from 2 (1/1) = 2
    # into 2: from 1 -> 1/2
    base = 1.0 - 0.85
    assert got[0] == got[2] == base + 0.85 * 0.5
    assert got[1] == base + 0.85 * 2.0


def test_pagerank_isolated_node_keeps_base(spark):
    from datalakehouse_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(0,), (1,), (9,)], "id long")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    got = {r.id: r.rank for r in pagerank(nodes, pairs, iters=2).collect()}
    assert got[9] == 1.0 - 0.85  # no in-edges: base rank after any iteration
