"""Unigram-LM (SentencePiece-style) trainer tests (round 16).

Pins: (1) the hard-EM reference trainer on hand-computable corpora,
(2) the seeding contract (alphabet always kept, min_freq + top-K on
multi-char pieces), (3) the enumeration argmax tie-break, (4) the
Viterbi DP's score-equivalence to exact enumeration (the unbounded-word
scale path), (5) auto/distributed/local path agreement, (6) a corpus
where the unigram tokenizer genuinely differs from BPE merge replay
(non-incremental vocabulary), and (7) tokenize-stats plumbing with the
zero-probability UNK-char closure.
"""

from __future__ import annotations

import pytest

from datalakehouse_spark.operators.unigram import (
    best_segmentation,
    seed_inventory_local,
    train_unigram_local,
    unigram_tokenize_stats,
    unigram_train,
    unigram_train_auto,
    viterbi_segment,
)


def test_seed_inventory_counts_overlapping_occurrences():
    inv = seed_inventory_local([("aaaa", 1)], max_piece_len=6, min_freq=2)
    # chars always kept; 'aa' occurs 3x, 'aaa' 2x, 'aaaa' 1x (< min_freq)
    assert inv == {"a": 4, "aa": 3, "aaa": 2}


def test_seed_top_k_cap_applies_to_multi_only():
    inv = seed_inventory_local(
        [("abab", 2), ("cd", 5)], max_piece_len=4, min_freq=2, seed_k=1
    )
    # multi-char candidates: ab:4, ba:2, aba:2, bab:2, abab:2, cd:5 —
    # top-1 by (count DESC, piece ASC) is cd; all chars survive the cap
    assert inv == {"a": 4, "b": 4, "c": 5, "d": 5, "cd": 5}


def test_hard_em_on_hand_computed_corpus():
    # inv {a:6, aa:3}, total 9: ["a","a"] scores (6/9)^2 > 3/9 = ["aa"]
    assert train_unigram_local([("aa", 3)]) == [("a", 6)]
    # inv {a:4, aa:3, aaa:2}, total 9: [aa,aa] 1/9 beats [a,aaa] 8/81
    assert train_unigram_local([("aaaa", 1)]) == [("aa", 2)]


def test_argmax_tie_breaks_on_fewest_pieces_then_lex():
    # equal probabilities: [ab] beats [a,b] on score; force a score tie
    # with zero-prob pieces -> fewest pieces wins
    probs = {"a": 0.0, "b": 0.0, "ab": 0.0}
    assert best_segmentation("ab", probs) == ["ab"]
    # no valid segmentation (missing char) -> None
    assert best_segmentation("xy", {"x": 0.5}) is None
    assert best_segmentation("", {}) == []


def test_viterbi_matches_enumeration_score():
    """The scale-path contract: viterbi_segment's segmentation always
    scores exactly what enumeration's best scores (ties may differ in
    the pieces picked, never in the score)."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(200):
        n = rng.randint(1, 9)
        word = "".join(rng.choice("ab") for _ in range(n))
        pieces = {"a", "b"}
        for _ in range(rng.randint(0, 6)):
            i = rng.randrange(n)
            j = rng.randint(i + 1, min(n, i + 4))
            pieces.add(word[i:j])
        total = sum(rng.randint(1, 9) for _ in pieces)
        probs = {}
        acc = 0
        for p in sorted(pieces):
            c = rng.randint(0, 9)
            acc += c
            probs[p] = c
        t = acc or 1
        probs = {p: c / t for p, c in probs.items()}

        def score(segs):
            s = 1.0
            for x in segs:
                s = s * probs[x]
            return s

        enum = best_segmentation(word, probs)
        vit = viterbi_segment(word, probs)
        assert (enum is None) == (vit is None)
        if enum is not None:
            assert score(vit) == score(enum), (word, probs, enum, vit)


def test_unigram_differs_from_bpe_merge_replay():
    """Non-incremental vocabulary: the unigram trainer seeds 'abcd'
    whole and its tokenizer emits it as ONE piece, while BPE with a
    2-merge budget can only reach [ab, cd] — the behavioral gap that
    makes the third trainer a genuinely different operator."""
    from datalakehouse_spark.operators.bpe import (
        apply_merges,
        train_merges_local,
    )

    wf = [("ab", 2), ("cd", 2), ("abcd", 2)]
    ranked = train_unigram_local(wf, rounds=1)
    inv = dict(ranked)
    assert "abcd" in inv
    total = sum(inv.values())
    probs = {p: c / total for p, c in inv.items()}
    assert best_segmentation("abcd", probs) == ["abcd"]

    merges = train_merges_local(wf, n_merges=2)
    assert apply_merges(list("abcd"), [(l, r) for l, r, _ in merges]) == [
        "ab",
        "cd",
    ]


def test_auto_and_distributed_match_local(spark):
    wf_rows = [("banana", 4), ("bandana", 3), ("cabana", 2), ("nab", 5)]
    words = spark.createDataFrame(wf_rows, "w string, f long")
    want = train_unigram_local(wf_rows)

    out_auto, ranked_auto = unigram_train_auto(spark, words)
    assert ranked_auto == want
    got_auto = [(r["piece"], r["freq"]) for r in out_auto.collect()]
    assert got_auto == want

    _, ranked_dist = unigram_train(spark, words)
    assert ranked_dist == want


def test_auto_probe_sentinel_falls_back(spark):
    wf_rows = [(f"w{chr(97 + i % 26)}{chr(97 + (i // 26) % 26)}", 1)
               for i in range(40)]
    words = spark.createDataFrame(wf_rows, "w string, f long")
    small, _ = unigram_train_auto(spark, words, local_rows_threshold=10)
    big, _ = unigram_train_auto(spark, words, local_rows_threshold=100000)
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )


def test_tokenize_stats_with_unk_closure(spark):
    inv = train_unigram_local([("aa", 3)])  # -> [("a", 6)]
    docs = spark.createDataFrame(
        [(1, "aa zz"), (2, ""), (3, "aq")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"])
        for r in unigram_tokenize_stats(docs, inv).collect()
    }
    # 'aa' -> [a, a]; 'zz' (unseen chars, prob 0) -> fewest pieces...
    # but 'zz' is not a piece, so only [z, z] is valid -> 2 tokens;
    # 'aq': q joins at 0.0 -> [a, q] (only valid split) -> 2 tokens
    assert got == {1: (2, 4, 4), 2: (0, 0, 0), 3: (1, 2, 2)}


def test_empty_words_dropped():
    assert train_unigram_local([("", 5)]) == []
    assert train_unigram_local([]) == []
