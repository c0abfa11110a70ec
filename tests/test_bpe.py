"""BPE tokenizer: trainer determinism, encoder equivalence, Spark parity."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transmog_spark.operators.bpe import (
    bpe_tokenize,
    bpe_train,
    encode_word,
    encode_word_rank_pass,
    seed_merges,
    train_bpe,
)

SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_sennrich_merges():
    # hand-computed: (e,s) and (s,t) tie at 9 -> lexicographic min; then
    # (es,t) 9; (l,o)/(o,w) tie at 7 -> (l,o); (lo,w) 7; (e,w)/(n,e)/(w,est)
    # tie at 6 -> (e,w)
    got = train_bpe(SENNRICH, 5)
    assert got == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")]


def test_encode_word_roundtrip_and_rank_pass_equivalence():
    merges = train_bpe(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "lowest", "wider", "x", ""]:
        a = encode_word(w, ranks)
        b = encode_word_rank_pass(w, merges)
        assert a == b
        assert "".join(a) == w


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=12
    ),
    st.integers(min_value=1, max_value=30),
)
def test_rank_pass_equivalence_property(words, num_merges):
    """Applying merges once each in rank order == lowest-rank-first encoding,
    for any merge list produced by training (training-consistency)."""
    counts: dict[str, int] = {}
    for i, w in enumerate(words):
        counts[w] = counts.get(w, 0) + 1 + (i % 3)
    merges = train_bpe(counts, num_merges, min_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        assert encode_word(w, ranks) == encode_word_rank_pass(w, merges)


def test_distributed_train_matches_pure_python(spark):
    texts = [
        "the lowest lower low",
        "newest widest new wide",
        "low low low newest newest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # pure-python mirror of the distributed word count (ASCII texts, so the
    # \p classes reduce to ASCII ranges)
    counts: dict[str, int] = {}
    for t in texts:
        for m in re.finditer(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+", t):
            counts[m.group(0)] = counts.get(m.group(0), 0) + 1
    assert bpe_train(df, num_merges=12, min_count=1) == train_bpe(
        counts, 12, min_count=1
    )


def test_bpe_tokenize_matches_pure_python(spark):
    merges = list(seed_merges())
    ranks = {p: i for i, p in enumerate(merges)}
    docs = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "processing the data pipeline, again and again!",
        2: "numbers 1234 and 567890 split into digit runs",
        3: "",
        4: "   ",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["tok_md5"])
        for r in bpe_tokenize(df, merges).collect()
    }
    for d, t in docs.items():
        words = re.findall(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+", t)
        toks = [s for w in words for s in encode_word(w, ranks)]
        md5 = hashlib.md5(chr(30).join(toks).encode()).hexdigest()
        assert got[d] == (len(words), len(toks), md5), d
    # whitespace-only and empty docs are present with zero counts
    assert got[3][0] == 0 and got[4][0] == 0


def test_seed_merges_compress(spark):
    """The seed tokenizer must actually compress common English text —
    fewer subword tokens than characters, more than words."""
    merges = list(seed_merges())
    # the loop stops early when no pair reaches min_count — the seed corpus
    # supports ~150 productive merges of the 200 requested
    assert 100 < len(merges) <= 200
    ranks = {p: i for i, p in enumerate(merges)}
    text = "the training corpus needs the most common words"
    words = re.findall(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+", text)
    toks = [s for w in words for s in encode_word(w, ranks)]
    assert len(words) <= len(toks) < sum(len(w) for w in words)
    # common seed words become single tokens
    assert encode_word("the", ranks) == ["the"]
    assert encode_word(" the", ranks) == [" the"]


def test_tokenizer_fertility_hand_computed(spark):
    """Exact word/token/char sums per source; a zero-word source reports
    NULL fertility instead of a division error."""
    from transmog_spark.operators.bpe import tokenizer_fertility

    # merge table that joins 't'+'h' then 'th'+'e' -> "the" is 1 token,
    # any other word splits to characters
    merges = [("t", "h"), ("th", "e")]
    rows = [
        # GPT-2-style pretokens: "the the" -> ["the", " the"]; the second
        # word carries its leading space, which no merge covers, so it
        # encodes as [' ', 'the'] — 3 tokens total for doc 0
        (0, "the the", "a"),   # 2 words, 3 tokens, 7 chars
        (1, "cat", "a"),       # 1 word, 3 tokens (c,a,t), 3 chars
        (2, "", "b"),          # 0 words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in tokenizer_fertility(df, merges).collect()}
    a = got["a"]
    assert (a.n_docs, a.n_words, a.n_tokens) == (2, 3, 6)
    assert a.fertility == round(6 / 3, 4)
    assert a.chars_per_token == round(10 / 6, 4)
    b = got["b"]
    assert (b.n_docs, b.n_words, b.n_tokens) == (1, 0, 0)
    assert b.fertility is None and b.chars_per_token is None
