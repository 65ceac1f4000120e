"""WordPiece trainer (operators/wordpiece.py, round 15).

Pins: the likelihood argmax (score = c/(u_l*u_r)) vs BPE's frequency
argmax on a corpus where they DISAGREE, path agreement (local single
task == distributed loop == sequential reference), the fused sentinel
probe, min-freq candidacy, and tie-breaking.
"""

from __future__ import annotations

from datalakehouse_spark.operators.bpe import bpe_train_auto
from datalakehouse_spark.operators.wordpiece import (
    train_wordpiece_local,
    wordpiece_train,
    wordpiece_train_auto,
)

# 'ba' appears often but b,a are everywhere (weak association);
# 'xy' is rarer but x,y occur ONLY together (perfect association)
DIVERGENT = [
    ("ba", 10),   # pair (b,a) freq 10
    ("ab", 9),    # inflates u(a), u(b) without adding (b,a) pairs
    ("aa", 8),
    ("bb", 7),
    ("xy", 3),    # pair (x,y) freq 3, u(x)=u(y)=3
]


def test_likelihood_argmax_diverges_from_bpe(spark):
    words = spark.createDataFrame(DIVERGENT, "w string, f long")
    _, wp = wordpiece_train_auto(spark, words, n_merges=1)
    _, bp = bpe_train_auto(spark, words, n_merges=1)
    # u(a) = 10+9+16 = 35, u(b) = 10+9+14 ... (b,a): c=10 but score tiny;
    # (x,y): c=3, score 3/(3*3) = 1/3 — the strongest association wins
    assert wp[0][:2] == ("x", "y")
    assert bp[0][:2] == ("b", "a")  # raw frequency picks the common pair


def test_paths_agree_and_probe_falls_back(spark):
    words = spark.createDataFrame(DIVERGENT, "w string, f long")
    ref = train_wordpiece_local(DIVERGENT, 4)
    t_local, m_local = wordpiece_train_auto(spark, words, n_merges=4)
    t_dist, m_dist = wordpiece_train(spark, words, n_merges=4)
    # threshold 2 < 5 rows: sentinel -> distributed loop
    _, m_over = wordpiece_train_auto(
        spark, words, n_merges=4, local_rows_threshold=2
    )
    assert m_local == m_dist == m_over == ref
    assert [tuple(r) for r in t_local.collect()] == [
        tuple(r) for r in t_dist.collect()
    ]
    # the output carries the exact integer triple, never a float
    row = t_local.collect()[0]
    assert (row["pair_freq"], row["left_freq"], row["right_freq"]) == (
        ref[0][2], ref[0][3], ref[0][4]
    )


def test_min_freq_gates_candidacy(spark):
    # (x,y) scores highest but its count 1 is under min_freq=2
    words = spark.createDataFrame(
        [("ba", 10), ("ab", 9), ("xy", 1)], "w string, f long"
    )
    _, merges = wordpiece_train_auto(spark, words, n_merges=1, min_freq=2)
    assert merges and merges[0][:2] != ("x", "y")
    ref = train_wordpiece_local([("ba", 10), ("ab", 9), ("xy", 1)], 1, 2)
    assert merges == ref


def test_empty_and_tie_handling():
    # empty words dropped; equal scores tie-break on pair key ASC
    assert train_wordpiece_local([("", 5)], 3) == []
    # (a,b) and (c,d): c=2 each, u's all 2 -> equal scores, (a,b) wins
    ref = train_wordpiece_local([("ab", 2), ("cd", 2)], 1, 2)
    assert ref[0][:2] == ("a", "b")


def test_longest_match_differs_from_merge_replay():
    """The defining runtime difference: pieces {ab, bc} from merges
    learned in rank order [(b,c), (a,b)] — replay fires rank 1 first
    ([a, bc]); longest-match takes the leftmost longest ([ab, c])."""
    from datalakehouse_spark.operators.bpe import apply_merges
    from datalakehouse_spark.operators.wordpiece import (
        longest_match_tokenize,
    )

    assert apply_merges(list("abc"), [("b", "c"), ("a", "b")]) == ["a", "bc"]
    assert longest_match_tokenize("abc", {"bc", "ab"}) == ["ab", "c"]
    # leftmost-longest priority over a longer later match
    assert longest_match_tokenize("abcd", {"abc", "ab", "cd"}) == ["abc", "d"]
    # no piece matches -> character fallback
    assert longest_match_tokenize("xyz", {"ab"}) == ["x", "y", "z"]
    assert longest_match_tokenize("", {"ab"}) == []


def test_longest_match_cap_derives_from_inventory():
    """ADVICE r15: the candidate-length cap must come from the piece
    inventory, not a fixed module constant — a 16-char piece must match
    a 16-char word even though the default trainer bound is 12."""
    from datalakehouse_spark.operators.wordpiece import (
        longest_match_tokenize,
    )

    long_piece = "abcdefghijklmnop"  # 16 chars
    assert longest_match_tokenize(long_piece, {long_piece}) == [long_piece]
    # an explicit cap below the piece length suppresses it (the knob a
    # hot-loop caller threads through)
    assert longest_match_tokenize(
        long_piece, {long_piece, "ab"}, max_piece=2
    ) == ["ab"] + list(long_piece[2:])


def test_wordpiece_tokenize_stats(spark):
    from datalakehouse_spark.operators.wordpiece import (
        wordpiece_tokenize_stats,
    )

    docs = spark.createDataFrame(
        [(1, "abc abcd"), (2, "xy"), (3, "a b")],
        "doc_id long, text string",
    )
    stats = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"])
        for r in wordpiece_tokenize_stats(docs, {"ab", "bc"}).collect()
    }
    # doc 1: abc -> [ab, c]; abcd -> [ab, c, d]  => 5 tokens
    assert stats[1] == (2, 7, 5)
    # doc 2: xy -> [x, y]
    assert stats[2] == (1, 2, 2)
    # doc 3: both words under min_len -> zeros
    assert stats[3] == (0, 0, 0)
