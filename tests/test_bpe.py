"""BPE vocabulary trainer (operators/bpe.py, round 14).

Pins: the greedy left-to-right merge fold (Python AND JVM sides,
bit-identical), the deterministic (freq DESC, pair ASC) argmax, the
min-freq early stop, ANSI safety on one-symbol words, the alphabet
guard, checkpoint-interval equivalence, and the tokenizer consumer.
"""

from __future__ import annotations

import pytest

from datalakehouse_spark.operators.bpe import (
    apply_merges,
    bpe_tokenize_stats,
    bpe_train,
    bpe_train_auto,
    word_frequencies,
)


def _reference_train(word_freqs, n_merges, min_freq=2):
    """Driver-side reference trainer: the textbook sequential
    algorithm, used only to check the distributed one."""
    words = [(list(w), f) for w, f in word_freqs]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (left, right), freq = best
        merges.append((left, right, freq))
        words = [(apply_merges(syms, [(left, right)]), f) for syms, f in words]
    return merges


def test_apply_merges_greedy_left_to_right():
    # 'aaa' + (a,a): greedy non-overlapping -> [aa, a]
    assert apply_merges(list("aaa"), [("a", "a")]) == ["aa", "a"]
    assert apply_merges(list("aaaa"), [("a", "a")]) == ["aa", "aa"]
    # merged symbols chain across ranks
    assert apply_merges(list("abab"), [("a", "b"), ("ab", "ab")]) == ["abab"]
    # a merge never fires inside an already-merged symbol
    assert apply_merges(["ab", "a", "b"], [("b", "a")]) == ["ab", "a", "b"]
    assert apply_merges([], [("a", "b")]) == []


def test_merge_prefilter_is_bit_exact():
    """The round-16 runtime fast path drops merges whose ``l + r``
    never occurs in the word (symbols are contiguous slices of the
    original word, so such a merge can never find an adjacent pair).
    Property: the filtered replay equals the full replay, for
    ARBITRARY merge tables — not just trained ones."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.text(alphabet="abcd", min_size=1, max_size=3)

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet="abcd", min_size=1, max_size=12),
        st.lists(st.tuples(sym, sym), min_size=0, max_size=8),
    )
    def check(word, pairs):
        full = apply_merges(list(word), pairs)
        filtered = apply_merges(
            list(word), [p for p in pairs if p[0] + p[1] in word]
        )
        assert full == filtered

    check()


def test_trainer_matches_reference_and_checkpoint_invariance(spark):
    freqs = [
        ("banana", 10),
        ("bandana", 7),
        ("anagram", 5),
        ("nap", 5),
        ("pan", 4),
        ("a", 3),  # one-symbol word: no pairs, must not break the fold
    ]
    words = spark.createDataFrame(freqs, "w string, f long")
    expected = _reference_train(freqs, n_merges=6)
    got_tables = []
    for ck in (0, 1, 3):
        table, merges = bpe_train(
            spark, words, n_merges=6, min_freq=2, checkpoint_every=ck
        )
        assert merges == expected, f"checkpoint_every={ck}"
        got_tables.append([tuple(r) for r in table.collect()])
    assert got_tables[0] == got_tables[1] == got_tables[2]
    # rank column is 1-based and pair_freq mirrors the argmax count
    assert got_tables[0][0][0] == 1
    assert all(r[4] >= 2 for r in got_tables[0])


def test_auto_paths_agree(spark):
    """bpe_train_auto's single-task path and the distributed loop must
    produce the identical merge table (same algorithm, two plans)."""
    freqs = [("banana", 10), ("bandana", 7), ("anagram", 5), ("pan", 4)]
    words = spark.createDataFrame(freqs, "w string, f long")
    t_local, m_local = bpe_train_auto(spark, words, n_merges=5)
    # threshold 0 forces the distributed iteration loop
    t_dist, m_dist = bpe_train_auto(
        spark, words, n_merges=5, local_rows_threshold=0
    )
    assert m_local == m_dist == _reference_train(freqs, 5)
    assert [tuple(r) for r in t_local.collect()] == [
        tuple(r) for r in t_dist.collect()
    ]


def test_auto_probe_is_one_job_and_sentinel_falls_back(spark):
    """The fused probe contract (VERDICT r14 #1): a bounded word table
    trains in exactly ONE Spark job (the limit-probe mapInPandas
    collect — no separate count(), no checkpoint job), and a table
    that overflows the threshold falls back to the distributed loop
    via the sentinel row, still matching the reference."""
    freqs = [("banana", 10), ("bandana", 7), ("anagram", 5), ("pan", 4)]
    words = spark.createDataFrame(freqs, "w string, f long")
    sc = spark.sparkContext
    sc.setJobGroup("bpe-auto-probe", "cold single-task train")
    try:
        _, merges = bpe_train_auto(spark, words, n_merges=5)
        jobs = sc.statusTracker().getJobIdsForGroup("bpe-auto-probe")
    finally:
        sc.setJobGroup("", "")
    assert merges == _reference_train(freqs, 5)
    assert len(jobs) == 1, f"cold small-table train ran {len(jobs)} jobs"
    # threshold 2 < 4 rows: the task sees threshold+1 rows, emits the
    # sentinel, and the distributed loop produces the same merges
    _, m_over = bpe_train_auto(spark, words, n_merges=5, local_rows_threshold=2)
    assert m_over == merges


def test_empty_words_are_dropped_not_fatal(spark):
    """ADVICE r14: a zero-length word (public-API misuse that
    word_frequencies can't produce) must contribute nothing instead of
    detonating the pair slice with a negative length."""
    freqs = [("", 100), ("banana", 10), ("bandana", 7)]
    words = spark.createDataFrame(freqs, "w string, f long")
    expected = _reference_train([("banana", 10), ("bandana", 7)], 4)
    _, m_dist = bpe_train(spark, words, n_merges=4)
    _, m_auto = bpe_train_auto(spark, words, n_merges=4)
    assert m_dist == m_auto == expected


def test_trainer_min_freq_stops_early(spark):
    words = spark.createDataFrame([("ab", 1), ("cd", 1)], "w string, f long")
    _, merges = bpe_train(spark, words, n_merges=5, min_freq=2)
    assert merges == []
    _, merges1 = bpe_train(spark, words, n_merges=5, min_freq=1)
    # (a,b) and (c,d) tie at 1; pair-string tie-break picks (a,b) first
    assert merges1[0][:2] == ("a", "b")


def test_alphabet_guard():
    from datalakehouse_spark.operators.bpe import _merge_fold_expr

    with pytest.raises(ValueError, match="alphabet"):
        _merge_fold_expr("a'b", "c")
    with pytest.raises(ValueError, match="alphabet"):
        _merge_fold_expr("ab", "")


def test_word_frequencies_and_tokenize_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "THE CAT ate"),
            (3, "x y z"),  # every word under min_len -> zero counts
        ],
        "doc_id long, text string",
    )
    wf = {r["w"]: r["f"] for r in word_frequencies(docs).collect()}
    assert wf == {"the": 3, "cat": 2, "sat": 1, "on": 1, "mat": 1, "ate": 1}

    stats = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"])
        for r in bpe_tokenize_stats(docs, [("a", "t"), ("c", "at")]).collect()
    }
    # doc 1: the [cat] s[at] on the m[at] -> 3+1+2+2+3+2 = 13 tokens
    # (rank-2 (c,at) chains on rank-1's output, collapsing 'cat' fully)
    assert stats[1] == (6, 17, 13)
    # doc 2: the [cat] [at]e -> 3 + 1 + 2 = 6
    assert stats[2] == (3, 9, 6)
    # doc 3: no qualifying words -> explicit zeros, not NULLs
    assert stats[3] == (0, 0, 0)


def test_versioned_vocab_pin_round_trip(spark, tmp_path):
    """VERDICT r14 #8's production contract, unit-scoped: a learned
    merge table committed through VersionedTable survives the
    round-trip bit-exactly, and a reader pinned to v1 keeps
    tokenizing identically after a NEWER vocab lands as v2."""
    from datalakehouse_spark.versioned import VersionedTable

    freqs = [("banana", 10), ("bandana", 7), ("anagram", 5)]
    words = spark.createDataFrame(freqs, "w string, f long")
    _, merges = bpe_train_auto(spark, words, n_merges=4)
    schema = (
        "rank int, left string, right string, merged string, pair_freq long"
    )
    rows = [
        (i + 1, left, right, left + right, freq)
        for i, (left, right, freq) in enumerate(merges)
    ]
    vt = VersionedTable(spark, str(tmp_path / "vocab"))
    assert vt.create(spark.createDataFrame(rows, schema)) == 1
    assert vt.append(
        spark.createDataFrame([(len(rows) + 1, "qq", "qq", "qqqq", 0)], schema)
    ) == 2
    pinned = sorted(vt.read(version=1).collect(), key=lambda r: r["rank"])
    assert [
        (r["left"], r["right"], r["pair_freq"]) for r in pinned
    ] == merges
    # the pinned tokenizer output is stable across vocab evolution
    before = apply_merges(list("bandana"), [(r["left"], r["right"]) for r in pinned])
    head = sorted(vt.read().collect(), key=lambda r: r["rank"])
    assert len(head) == len(pinned) + 1  # head sees v2's extra merge
    assert apply_merges(
        list("bandana"), [(r["left"], r["right"]) for r in pinned]
    ) == before
