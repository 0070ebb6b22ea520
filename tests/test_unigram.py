"""Unigram-LM (SentencePiece-style) tokenizer trainer: reference
goldens, the pinned Viterbi tie-break, distributed == single-process
equality, and encode behavior."""

import random

import pytest

from hquery_php_spark.operators.unigram import (
    _lp_micro,
    unigram_reference,
    viterbi_segment,
)


def test_viterbi_prefers_higher_score():
    sc = {"a": -10, "b": -10, "ab": -15}
    assert viterbi_segment("ab", sc, 2) == ["ab"]  # -15 > -20
    sc2 = {"a": -10, "b": -10, "ab": -25}
    assert viterbi_segment("ab", sc2, 2) == ["a", "b"]


def test_viterbi_tie_prefers_longer_last_piece():
    # [ab,c] and [a,bc] tie exactly: the pinned rule keeps the SMALLER
    # split point at the end -> longer last piece -> [a, bc]
    sc = {"a": -10, "b": -10, "c": -10, "ab": -15, "bc": -15}
    assert viterbi_segment("abc", sc, 2) == ["a", "bc"]


def test_viterbi_unknown_char_fallback():
    sc = {"a": -10}
    assert viterbi_segment("axa", sc, 2) == ["a", "x", "a"]


def test_reference_golden_three_word_corpus():
    out = unigram_reference(
        [("abab", 10), ("abcabc", 6), ("aabb", 4)],
        vocab_size=4, max_piece_len=3, rounds=1, min_count=1,
    )
    # at these freq ratios "aabb" segments [a, ab, b] (ab's mass beats
    # the [a, abb] path) — unlike the equal-weight corpus in the driver
    # row, where the exact tie resolves to [a, abb]
    assert [(p, c) for p, c, _ in out] == [
        ("a", 4), ("ab", 24), ("abc", 12), ("b", 4), ("c", 1)
    ]
    total = 4 + 24 + 12 + 4 + 1
    for p, c, lp in out:
        assert lp == _lp_micro(c, total)


def test_single_chars_never_pruned():
    out = unigram_reference(
        [("zzzz", 100), ("q", 1)], vocab_size=1, max_piece_len=3, rounds=2
    )
    pieces = {p for p, _, _ in out}
    assert {"z", "q"} <= pieces


def test_rounds_converge_counts():
    wf = [("banana", 8), ("bandana", 4), ("ananas", 2)]
    r1 = unigram_reference(wf, 6, 3, 1)
    r3 = unigram_reference(wf, 6, 3, 3)
    # training runs, stays segmentable, and total mass is conserved
    for out in (r1, r3):
        assert sum(c for _, c, _ in out) > 0
        sc = {p: lp for p, _, lp in out}
        for w, _ in wf:
            seg = viterbi_segment(w, sc, 3)
            assert "".join(seg) == w


def test_fuzz_every_word_resegments_exactly():
    rnd = random.Random(7)
    words = [
        "".join(rnd.choice("abcd") for _ in range(rnd.randint(1, 9)))
        for _ in range(40)
    ]
    wf = [(w, rnd.randint(1, 20)) for w in sorted(set(words))]
    out = unigram_reference(wf, vocab_size=16, max_piece_len=4, rounds=2)
    sc = {p: lp for p, _, lp in out}
    for w, _ in wf:
        assert "".join(viterbi_segment(w, sc, 4)) == w


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_distributed_equals_reference(spark):
    from hquery_php_spark.operators.unigram import train_unigram

    rnd = random.Random(11)
    words = sorted(
        {
            "".join(rnd.choice("abcde") for _ in range(rnd.randint(1, 8)))
            for _ in range(60)
        }
    )
    wf = [(w, rnd.randint(1, 30)) for w in words]
    wdf = spark.createDataFrame(wf, "word string, freq long")
    out, scores = train_unigram(
        wdf, vocab_size=12, max_piece_len=3, rounds=2
    )
    got = [(r["piece"], r["cnt"], r["lp_micro"]) for r in out.orderBy("piece").collect()]
    want = unigram_reference(wf, vocab_size=12, max_piece_len=3, rounds=2)
    assert got == want


def test_encode_df_memo_and_values(spark):
    from hquery_php_spark.operators.unigram import (
        train_unigram,
        unigram_encode_df,
    )

    wf = [("abab", 10), ("abcabc", 6), ("aabb", 4)]
    wdf = spark.createDataFrame(wf, "word string, freq long")
    _, scores = train_unigram(wdf, vocab_size=4, max_piece_len=3, rounds=1)
    docs = spark.createDataFrame(
        [(1, "Abab ABAB aabb"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_encode_df(docs, scores, 3).collect()}
    assert rows[1]["pieces"] == ["ab", "ab", "ab", "ab", "a", "ab", "b"]
    assert rows[1]["n_pieces"] == 7
    assert rows[2]["pieces"] == [] and rows[2]["n_pieces"] == 0
