"""WordPiece subword tokenizer: likelihood-scored train, greedy encode.

Completes the subword triad next to BPE (``operators/bpe.py``, merge-rank
encoding) and unigram-LM (``operators/unigram.py``, Viterbi): WordPiece is
the BERT-family tokenizer (Wu et al. 2016; Devlin et al. 2019 §4.1 via the
public HuggingFace ``tokenizers`` semantics), so ``objectives.mlm_mask``
gets its real input representation. No reference analog (the reference is
a flattening library); engine surface for the training-data tier.

Two public differences from BPE, both load-bearing:

* **training score** is the pair LIKELIHOOD ``count(ab) / (count(a) *
  count(b))`` — not the raw pair count — so merges prefer pairs that
  co-occur more than their parts predict. Scores are compared as EXACT
  fractions (``fractions.Fraction`` on integer counts): no float ladder,
  bit-identical merge order on every host. Ties break on the
  lexicographically smallest (left, right).
* **encoding** is greedy longest-match-first against the final vocabulary
  (continuation pieces carry the ``##`` prefix); a word with ANY
  untokenizable position becomes a single ``[UNK]`` — partial pieces are
  discarded (the BERT rule), not emitted.

Scale shape (100 TB posture): training aggregates word counts distributed
(explode -> map-side combined groupBy -> TakeOrdered top ``max_words``)
and runs the merge loop driver-side on that bounded table — identical to
``bpe_train``'s posture (driver state independent of corpus size).
Encoding is a map-only Arrow-batched pandas UDF with a per-batch
distinct-word cache (Zipf -> near-total hits); the vocabulary rides the
closure as a frozenset. No shuffle anywhere in the encode path.

Cross-engine determinism: the word pre-tokenizer is one RE2-safe pattern
(no lookaround/backrefs) evaluated identically by Java regex and DuckDB's
RE2; greedy longest-match is mirrored in SQL by a PRECOMPUTED choice
table — the greedy decision at (word, pos) is path-independent, so the
mirror materializes argmax-length matches for every position
non-recursively and a recursive CTE just walks them (see
``oracle.wordpiece_tokenize_sql``).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# RE2-compatible word splitter: letter runs | digit runs | symbol runs.
# Unlike bpe.PRETOKEN_RE there is no attached leading space — WordPiece
# marks word-internal continuation with '##', not word starts with ' '.
WP_WORD_RE = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"

UNK = "[UNK]"


def wp_words(text: Column) -> Column:
    """Word array (JVM-side regex, codegen'd)."""
    return F.regexp_extract_all(text, F.lit(WP_WORD_RE), F.lit(0))


def _cont(sym: str) -> str:
    """The continuation-form payload of a symbol ('##ab' -> 'ab')."""
    return sym[2:] if sym.startswith("##") else sym


def train_wordpiece(
    word_counts: dict[str, int],
    num_merges: int,
    *,
    min_count: int = 2,
) -> list[str]:
    """The WordPiece merge loop over a word-frequency table.

    Each round merges the adjacent symbol pair maximizing the exact
    fraction ``pair_count / (left_count * right_count)`` (ties:
    lexicographically smallest pair); the merged symbol is
    ``left + payload(right)`` and keeps left's start/continuation status.
    Stops early when no pair reaches ``min_count`` occurrences. Returns
    the full vocabulary: ``[UNK]``, the initial alphabet (first char
    plain, rest '##'-prefixed), and the merged symbols — sorted for a
    deterministic artifact.
    """
    seqs: dict[str, tuple[str, ...]] = {}
    for w in word_counts:
        if not w:
            continue
        seqs[w] = tuple([w[0]] + ["##" + c for c in w[1:]])

    sym_counts: Counter = Counter()
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[str]] = defaultdict(set)
    for w, seq in seqs.items():
        c = word_counts[w]
        for s in seq:
            sym_counts[s] += c
        for p in zip(seq, seq[1:]):
            pair_counts[p] += c
            pair_words[p].add(w)

    alphabet = set(sym_counts)
    merged: list[str] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_score: Fraction | None = None
        for p, c in pair_counts.items():
            if c < min_count:
                continue
            score = Fraction(c, sym_counts[p[0]] * sym_counts[p[1]])
            if (
                best_score is None
                or score > best_score
                or (score == best_score and p < best)  # type: ignore[operator]
            ):
                best, best_score = p, score
        if best is None:
            break
        new_sym = best[0] + _cont(best[1])
        merged.append(new_sym)
        for w in list(pair_words[best]):
            c = word_counts[w]
            old = seqs[w]
            new_seq: list[str] = []
            i = 0
            while i < len(old):
                if (
                    i + 1 < len(old)
                    and old[i] == best[0]
                    and old[i + 1] == best[1]
                ):
                    new_seq.append(new_sym)
                    i += 2
                else:
                    new_seq.append(old[i])
                    i += 1
            new = tuple(new_seq)
            seqs[w] = new
            for s in old:
                sym_counts[s] -= c
            for p in zip(old, old[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(w)
            for s in new:
                sym_counts[s] += c
            for p in zip(new, new[1:]):
                pair_counts[p] += c
                pair_words[p].add(w)
    return sorted({UNK} | alphabet | set(merged))


def encode_word_wp(word: str, vocab: frozenset[str]) -> list[str]:
    """Greedy longest-match-first WordPiece encode of one word. Any
    position with no vocabulary match collapses the WHOLE word to
    ``[UNK]`` (partial pieces discarded — the BERT rule)."""
    n = len(word)
    pieces: list[str] = []
    pos = 0
    while pos < n:
        found = None
        for end in range(n, pos, -1):
            cand = word[pos:end] if pos == 0 else "##" + word[pos:end]
            # a start candidate must not itself carry the continuation
            # prefix: a flat vocab can't distinguish a merged start
            # symbol that happens to BEGIN with '##' (possible when the
            # corpus contains literal '#' runs) from a continuation
            # piece — the continuation reading wins, on both engines
            # (the SQL mirror applies the identical NOT LIKE '##%' rule)
            if pos == 0 and cand.startswith("##"):
                continue
            if cand in vocab:
                found = cand
                break
        if found is None:
            return [UNK]
        pieces.append(found)
        pos += len(found) - 2 if pos > 0 else len(found)
    return pieces


def wordpiece_word_counts(
    df: DataFrame, text_col: str = "text", *, max_words: int = 30_000
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, bounded for the driver (the
    ``bpe_word_counts`` posture over the WP word splitter)."""
    rows = (
        df.select(F.explode(wp_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 200,
    max_words: int = 30_000,
    min_count: int = 2,
) -> list[str]:
    """Train a WordPiece vocabulary on a corpus: distributed counts,
    driver merge loop (bounded by ``max_words``)."""
    return train_wordpiece(
        dict(wordpiece_word_counts(df, text_col, max_words=max_words)),
        num_merges,
        min_count=min_count,
    )


def wordpiece_encode_udf(vocab: list[str] | tuple[str, ...]):
    """Arrow-batched greedy encoder over a word-array column: each output
    element is ONE WORD's pieces joined by chr(31) (so downstream JVM
    exprs can count pieces and hash the stream without re-entering
    Python). Per-batch distinct-word cache; vocab rides the closure."""
    vset = frozenset(vocab)

    @pandas_udf(ArrayType(StringType()))
    def _encode(words: pd.Series) -> pd.Series:
        cache: dict[str, str] = {}

        def enc(ws):
            out: list[str] = []
            for w in ws:
                s = cache.get(w)
                if s is None:
                    s = chr(31).join(encode_word_wp(w, vset))
                    cache[w] = s
                out.append(s)
            return out

        return words.apply(enc)

    return _encode.asNondeterministic()


def wordpiece_tokenize(
    df: DataFrame,
    vocab: list[str] | tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc WordPiece tokenization summary: (id, n_words, n_pieces,
    n_unk, piece_md5) where piece_md5 hashes the full ordered piece
    stream (pieces joined chr(31) inside a word, words joined chr(30)) —
    the cross-engine proof both encoders produced the byte-identical
    stream. n_unk counts words that collapsed to ``[UNK]`` (a word can
    never literally BE '[UNK]': the splitter breaks '[', 'UNK', ']').

    Caveat (same family as bpe_tokenize's): U+001F is not regex
    whitespace, so raw text containing it yields symbol-run words whose
    pieces embed the frame separator — piece_md5 stays engine-identical
    (same strings hashed), but n_pieces (counted by chr(31) framing here,
    by walk steps in the mirror) would diverge. Strip control characters
    upstream (strip_html / norm_text do) when ingesting raw binary-ish
    text.

    Scale shape: one narrow projection + one Arrow encode pass; zero
    shuffles (the plan-quality test pins this).
    """
    enc = wordpiece_encode_udf(vocab)
    out = df.select(
        F.col(id_col), wp_words(F.col(text_col)).alias("__ws")
    ).withColumn("__enc", enc(F.col("__ws")))
    n_pieces = F.aggregate(
        F.col("__enc"),
        F.lit(0).cast("long"),
        lambda acc, e: acc + F.size(F.split(e, chr(31), -1)),
    )
    n_unk = F.size(F.filter(F.col("__enc"), lambda e: e == F.lit(UNK)))
    return out.select(
        F.col(id_col),
        F.size("__ws").alias("n_words"),
        n_pieces.alias("n_pieces"),
        n_unk.cast("long").alias("n_unk"),
        F.md5(F.concat_ws(chr(30), F.col("__enc"))).alias("piece_md5"),
    )


# ---------------------------------------------------------------------------
# Fixed seed vocabulary: trained once (pure Python, no Spark) on the same
# deterministic embedded corpus the BPE seed uses, so oracle_sql() has the
# identical artifact without running Spark — the "tokenizer trained
# offline, applied everywhere" shape of real pipelines.
# ---------------------------------------------------------------------------

SEED_WP_MERGES = 150


@lru_cache(maxsize=4)
def seed_wp_vocab(num_merges: int = SEED_WP_MERGES) -> tuple[str, ...]:
    """The fixed WordPiece vocabulary (deterministic, computed at first
    use) over ``bpe._SEED_TEXT`` with the pure-Python equivalent of
    WP_WORD_RE (the seed text is ASCII, where they agree)."""
    import re as _re

    from transmog_spark.operators.bpe import _SEED_TEXT

    counts: Counter = Counter()
    for m in _re.finditer(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+", _SEED_TEXT):
        counts[m.group(0)] += 1
    return tuple(train_wordpiece(dict(counts), num_merges, min_count=2))
