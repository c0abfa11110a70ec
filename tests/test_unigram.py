"""Unigram-LM tokenizer: Viterbi DP, Viterbi-EM training, engine parity."""

from __future__ import annotations

import pytest

from transmog_spark.operators.unigram import (
    DEFAULT_OOV_COST,
    seed_vocab,
    train_unigram,
    unigram_tokenize,
    unigram_train,
    viterbi_segment,
)


def test_viterbi_picks_cheapest_segmentation():
    costs = {"a": 10, "b": 10, "ab": 5, "abc": 100, "c": 10}
    pieces, cost, path = viterbi_segment("abc", costs)
    assert pieces == ["ab", "c"]
    assert cost == 15
    assert path == "ab" + chr(31) + "c"


def test_viterbi_tie_breaks_on_fewer_pieces_then_path():
    # "aa" via ("aa")=20 vs ("a","a")=20: equal cost -> fewer pieces wins
    costs = {"a": 10, "aa": 20}
    pieces, cost, _ = viterbi_segment("aa", costs)
    assert pieces == ["aa"] and cost == 20
    # equal cost AND equal n_pieces -> lexicographically smaller path wins:
    # "abab" as (ab|ab) path "ab\x1fab" vs (a|bab)... construct a true tie
    costs = {"ab": 7, "a": 3, "b": 4, "ba": 7}
    # "aba": (ab|a)=10 path "ab\x1fa"; (a|ba)=10 path "a\x1fba" -> latter smaller
    pieces, cost, path = viterbi_segment("aba", costs)
    assert cost == 10
    assert pieces == ["a", "ba"], pieces


def test_viterbi_oov_single_char_fallback():
    costs = {"a": 10}
    pieces, cost, _ = viterbi_segment("axa", costs)
    assert pieces == ["a", "x", "a"]
    assert cost == 20 + DEFAULT_OOV_COST


def test_viterbi_respects_max_piece_len():
    costs = {"abcd": 1, "ab": 10, "cd": 10}
    pieces, cost, _ = viterbi_segment("abcd", costs, max_piece_len=2)
    assert pieces == ["ab", "cd"]


def test_train_keeps_all_chars_and_is_deterministic():
    wc = {"the": 50, "them": 20, "theme": 10, "tea": 30, "ate": 5}
    v1 = train_unigram(wc, vocab_size=12)
    v2 = train_unigram(dict(reversed(list(wc.items()))), vocab_size=12)
    assert v1 == v2  # insertion order of the counts dict is irrelevant
    pieces = {p for p, _ in v1}
    for ch in set("".join(wc)):
        assert ch in pieces
    assert len(v1) <= 12
    # frequent substrings earn a multi-char piece
    assert any(len(p) > 1 for p in pieces)


def test_seed_vocab_stable_and_covers_ascii_seed():
    v = seed_vocab()
    assert v == seed_vocab()  # cached + deterministic
    assert len(v) <= 120
    pieces = dict(v)
    assert all(isinstance(c, int) and c > 0 for c in pieces.values())
    # the workhorse English fragment should have earned a cheap piece
    assert any("the" in p for p in pieces)


def test_unigram_tokenize_matches_driver_side_reference(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "tokenizer learns pieces, pieces learn nothing"),
        (3, ""),
        (4, "zzz qqq 12345"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = list(seed_vocab())
    got = {r["doc_id"]: r for r in unigram_tokenize(df, vocab).collect()}
    assert set(got) == {1, 2, 3, 4}

    # driver-side reference: same pretokenizer regex + same Viterbi
    import re

    costs = dict(vocab)
    for doc_id, text in rows:
        ws = re.findall(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+", text)
        total_cost = 0
        n_pieces = 0
        paths = []
        for w in ws:
            pieces, cost, path = viterbi_segment(w, costs)
            total_cost += cost
            n_pieces += len(pieces)
            paths.append(path)
        r = got[doc_id]
        assert r["n_words"] == len(ws)
        assert r["n_pieces"] == n_pieces
        assert r["total_cost"] == total_cost
    assert got[3]["n_words"] == 0 and got[3]["total_cost"] == 0


def test_unigram_train_distributed_matches_local(spark):
    texts = [
        "the engine packs tokens into sequences",
        "the tokenizer learns the common pieces",
        "sequences of tokens feed the model",
    ] * 5
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    v_dist = unigram_train(df, "text", vocab_size=40)
    import re
    from collections import Counter

    counts: Counter = Counter()
    for t in texts:
        for m in re.finditer(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+", t):
            counts[m.group(0)] += 1
    v_local = train_unigram(dict(counts), vocab_size=40)
    assert v_dist == v_local


def test_unigram_tokenize_deterministic_across_partitionings(spark):
    texts = [(i, f"document number {i} talks about the engine") for i in range(40)]
    vocab = list(seed_vocab())
    a = spark.createDataFrame(texts, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(texts, "doc_id long, text string").repartition(16)
    ra = sorted(map(tuple, unigram_tokenize(a, vocab).collect()))
    rb = sorted(map(tuple, unigram_tokenize(b, vocab).collect()))
    assert ra == rb
