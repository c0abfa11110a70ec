"""WordPiece tokenizer: likelihood trainer, greedy encoder, engine parity."""

from __future__ import annotations

from transmog_spark.operators.wordpiece import (
    UNK,
    encode_word_wp,
    seed_wp_vocab,
    train_wordpiece,
    wordpiece_tokenize,
    wordpiece_train,
)


def test_trainer_prefers_likelihood_over_raw_count():
    # pair ('q', '##z') occurs 5 times and ONLY together (likelihood 5/25);
    # pair ('t', '##h') occurs 8 times but 't' and '##h' each occur 20
    # times elsewhere (likelihood 8/400) — WordPiece merges 'qz' first even
    # though 'th' has the higher raw count (BPE would pick 'th').
    wc = {"qz": 5, "th": 8, "ta": 12, "xh": 12}
    vocab = train_wordpiece(wc, 1)
    assert "qz" in vocab and "th" not in vocab


def test_trainer_merged_symbol_keeps_start_status_and_payload():
    wc = {"abc": 10}
    vocab = train_wordpiece(wc, 10, min_count=1)
    # full merge chain reaches the whole word as a start symbol
    assert "abc" in vocab or "ab" in vocab
    vs = frozenset(vocab)
    assert encode_word_wp("abc", vs) != [UNK]
    # alphabet always present: first char plain, rest continuation
    assert "a" in vocab and "##b" in vocab and "##c" in vocab
    assert UNK in vocab


def test_greedy_longest_match_and_unk_rule():
    vs = frozenset(["he", "hell", "##o", "##llo", "l", "[UNK]"])
    # longest-first: 'hell' beats 'he', then '##o'
    assert encode_word_wp("hello", vs) == ["hell", "##o"]
    # dead end AFTER partial progress -> whole word UNK, pieces discarded
    assert encode_word_wp("hex", vs) == [UNK]
    # un-startable word -> UNK
    assert encode_word_wp("zzz", vs) == [UNK]


def test_start_candidate_never_carries_continuation_prefix():
    # '##' present as a (merged-start-shaped) flat vocab entry must NOT
    # match at position 0 — the continuation reading wins on both engines.
    vs = frozenset(["##", "#", "###", "[UNK]"])
    assert encode_word_wp("##", vs) == ["#", "###"]


def test_trainer_deterministic_and_seed_vocab_stable():
    wc = {"hello": 10, "hell": 5, "help": 5, "world": 8}
    assert train_wordpiece(dict(wc), 20) == train_wordpiece(dict(wc), 20)
    v1 = seed_wp_vocab()
    assert v1 == seed_wp_vocab()
    assert UNK in v1 and len(v1) > 50


def test_spark_tokenize_matches_pure_python(spark):
    import re

    rows = [
        ("d1", "the quick brown fox"),
        ("d2", "tokenizer learns merges, really!"),
        ("d3", ""),
        ("d4", "zzzéqqq 1234"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    vocab = wordpiece_train(df, "text", num_merges=30, min_count=1)
    out = {
        r["doc_id"]: r
        for r in wordpiece_tokenize(df, vocab, "doc_id", "text").collect()
    }
    vs = frozenset(vocab)
    for did, text in rows:
        words = re.findall(r"[^\W\d_]+|\d+|[^\w\s]+", text, re.UNICODE)
        encs = [encode_word_wp(w, vs) for w in words]
        r = out[did]
        assert r["n_words"] == len(words), did
        assert r["n_pieces"] == sum(len(e) for e in encs), did
        assert r["n_unk"] == sum(1 for e in encs if e == [UNK]), did
        import hashlib

        stream = chr(30).join(chr(31).join(e) for e in encs)
        assert r["piece_md5"] == hashlib.md5(stream.encode()).hexdigest(), did


def test_encoder_reconstruction_property():
    # for ANY corpus-trained vocab and ANY word: the encoded pieces either
    # reconstruct the word exactly (strip '##' continuations) or the word
    # collapses to exactly [UNK] — never partial output
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        corpus=st.lists(
            st.text(alphabet="abcdef#", min_size=1, max_size=8),
            min_size=1,
            max_size=12,
        ),
        word=st.text(alphabet="abcdef#", min_size=1, max_size=12),
        merges=st.integers(min_value=0, max_value=30),
    )
    def check(corpus, word, merges):
        from collections import Counter

        vocab = train_wordpiece(dict(Counter(corpus)), merges, min_count=1)
        vs = frozenset(vocab)
        pieces = encode_word_wp(word, vs)
        assert pieces, "encoder must emit at least one piece"
        if pieces == [UNK]:
            return
        rebuilt = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert rebuilt == word, (word, pieces)
        # every non-first piece must be a continuation form
        for p in pieces[1:]:
            assert p.startswith("##"), (word, pieces)

    check()
