"""Unigram-LM subword tokenizer: Viterbi-EM train, Viterbi encode.

The unigram language-model tokenizer of Kudo 2018 ("Subword
Regularization", arXiv:1804.10959 — the SentencePiece `unigram` model),
in its deterministic hard-EM (Viterbi-EM) form: each piece carries a
scaled-integer cost (−log p on a 1e-6 grid), a word's segmentation is
the cost-minimal path through its substring lattice, and training
alternates Viterbi segmentation of the word-frequency table with
re-estimation of piece frequencies from the chosen paths. Complements
``operators/bpe.py`` (the other major subword family) with the same
engine shape — the reference (scottdraper8/transmog) has no tokenizer;
this is engine surface for the training-data tier.

Scale shape (100 TB posture):

* **training** reuses BPE's distributed word-frequency table
  (``bpe_word_counts``: explode → map-side combined groupBy →
  TakeOrdered top ``max_words``) and runs Viterbi-EM driver-side on that
  bounded table — SentencePiece's own posture (train on a sample, apply
  everywhere). Driver state is ``max_words`` rows + a ``vocab_size``
  dict, independent of corpus size.
* **encoding** is a map-only Arrow-batched pandas UDF with a per-batch
  distinct-word cache (Zipf → near-total hits); the vocabulary rides the
  closure (a few hundred (piece, cost) pairs). No shuffle, no driver
  state.

Cross-engine determinism: costs are integers fixed at train time (the
only transcendental — log — runs once, driver-side, and both engines
receive the same literals), so every Viterbi comparison is exact integer
+ string ordering. Ties break on (cost, n_pieces, path-string) where the
path joins pieces with chr(31); pieces reaching the same lattice position
concatenate to the same prefix of the word, so equal-(cost, n_pieces)
paths are equal-length strings and prefix-pruned DP is exactly the
global minimum the oracle's row_number() picks (UTF-8 binary order and
codepoint order agree — UTF-8 is order-preserving). Characters outside
the trained vocabulary segment as single-char pieces at ``DEFAULT_OOV_COST``
on both engines.
"""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from transmog_spark.operators.bpe import _SEED_TEXT, bpe_word_counts, pretokenize

SCALE = 1_000_000
# cost of an out-of-vocabulary single-character piece: e^-24 ≈ 4e-11 —
# far below any trained piece, so OOV chars never displace a vocab path
DEFAULT_OOV_COST = 24 * SCALE
_SEP = chr(31)  # piece separator inside a word's path string
_WSEP = chr(30)  # word separator in the per-doc piece stream


def viterbi_segment(
    word: str,
    costs: dict[str, int],
    *,
    max_piece_len: int = 6,
    oov_cost: int = DEFAULT_OOV_COST,
) -> tuple[list[str], int, str]:
    """Cost-minimal segmentation of ``word`` under integer piece costs.

    Returns (pieces, total_cost, path) where path = pieces joined by
    chr(31). DP state per lattice position is the lexicographic minimum of
    (cost, n_pieces, path) — see the module docstring for why prefix
    pruning is exact. Characters not in ``costs`` advance as single-char
    pieces at ``oov_cost``.
    """
    n = len(word)
    if n == 0:
        return [], 0, ""
    best: list[tuple[int, int, str] | None] = [None] * (n + 1)
    best[0] = (0, 0, "")
    for i in range(1, n + 1):
        cur: tuple[int, int, str] | None = None
        for length in range(1, min(max_piece_len, i) + 1):
            prev = best[i - length]
            if prev is None:
                continue
            piece = word[i - length : i]
            c = costs.get(piece)
            if c is None:
                if length != 1:
                    continue
                c = oov_cost
            cand = (
                prev[0] + c,
                prev[1] + 1,
                piece if not prev[2] else prev[2] + _SEP + piece,
            )
            if cur is None or cand < cur:
                cur = cand
        best[i] = cur
    cost, _, path = best[n]  # always reachable: single-char steps exist
    return path.split(_SEP), cost, path


def train_unigram(
    word_counts: dict[str, int],
    *,
    vocab_size: int = 150,
    max_piece_len: int = 6,
    em_iterations: int = 3,
    min_count: int = 2,
    scale: int = SCALE,
) -> list[tuple[str, int]]:
    """Viterbi-EM over a word-frequency table → [(piece, cost_int)].

    Seed vocabulary is every substring up to ``max_piece_len`` weighted by
    word frequency (single characters always kept — any word stays
    segmentable); each EM round Viterbi-segments the table under current
    costs, re-counts piece usage, keeps the top multi-char pieces by
    (usage desc, piece asc) with usage ≥ ``min_count``, and re-derives
    costs = round(−log(freq/total)·scale). Deterministic: integer counts,
    total-ordered ties, and log runs only here (driver-side) — the
    emitted costs are plain integers both engines consume as literals.
    Unused single chars keep a +1-smoothed frequency so their cost stays
    finite.
    """
    cand: Counter = Counter()
    for w, c in word_counts.items():
        for i in range(len(w)):
            for length in range(1, min(max_piece_len, len(w) - i) + 1):
                cand[w[i : i + length]] += c
    chars = sorted(p for p in cand if len(p) == 1)

    def costs_from(freqs: dict[str, int]) -> dict[str, int]:
        total = sum(freqs.values())
        return {
            p: round(-math.log(f / total) * scale) for p, f in freqs.items()
        }

    n_multi = max(0, vocab_size - len(chars))
    multi = sorted(
        (p for p in cand if len(p) > 1 and cand[p] >= min_count),
        key=lambda p: (-cand[p], p),
    )[:n_multi]
    costs = costs_from({p: cand[p] for p in chars + multi})

    for _ in range(em_iterations):
        usage: Counter = Counter()
        for w, c in word_counts.items():
            pieces, _, _ = viterbi_segment(
                w, costs, max_piece_len=max_piece_len, oov_cost=DEFAULT_OOV_COST
            )
            for p in pieces:
                usage[p] += c
        freqs = {p: usage.get(p, 0) + 1 for p in chars}
        kept = sorted(
            (p for p in costs if len(p) > 1 and usage.get(p, 0) >= min_count),
            key=lambda p: (-usage[p], p),
        )[:n_multi]
        freqs.update({p: usage[p] for p in kept})
        costs = costs_from(freqs)
    return sorted(costs.items())


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    vocab_size: int = 150,
    max_piece_len: int = 6,
    em_iterations: int = 3,
    max_words: int = 30_000,
    min_count: int = 2,
) -> list[tuple[str, int]]:
    """Train on a corpus: distributed word counts, driver EM loop."""
    return train_unigram(
        dict(bpe_word_counts(df, text_col, max_words=max_words)),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        em_iterations=em_iterations,
        min_count=min_count,
    )


def unigram_encode_udf(
    vocab: list[tuple[str, int]],
    *,
    max_piece_len: int = 6,
    oov_cost: int = DEFAULT_OOV_COST,
    single_eval: bool = True,
):
    """Arrow-batched Viterbi encoder over a pre-token array column →
    struct(paths array<string>, n_pieces bigint, total_cost bigint).
    Distinct words are segmented once per batch; the vocabulary rides the
    closure. ``single_eval`` is the optimizer barrier of
    ``bpe_encode_udf`` — the struct feeds several projections and the
    barrier keeps the encoder at ONE ArrowEvalPython node."""
    costs = dict(vocab)

    @pandas_udf("paths array<string>, n_pieces bigint, total_cost bigint")
    def _encode(words: pd.Series) -> pd.DataFrame:
        cache: dict[str, tuple[str, int, int]] = {}
        out = []
        for ws in words:
            paths: list[str] = []
            n_pieces = 0
            total = 0
            for w in ws:
                r = cache.get(w)
                if r is None:
                    pieces, cost, path = viterbi_segment(
                        w, costs, max_piece_len=max_piece_len, oov_cost=oov_cost
                    )
                    r = (path, len(pieces), cost)
                    cache[w] = r
                paths.append(r[0])
                n_pieces += r[1]
                total += r[2]
            out.append((paths, n_pieces, total))
        return pd.DataFrame(out, columns=["paths", "n_pieces", "total_cost"])

    return _encode.asNondeterministic() if single_eval else _encode


def unigram_tokenize(
    df: DataFrame,
    vocab: list[tuple[str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_piece_len: int = 6,
    oov_cost: int = DEFAULT_OOV_COST,
) -> DataFrame:
    """Per-doc unigram tokenization summary: (id, n_words, n_pieces,
    total_cost, piece_md5) where piece_md5 hashes the ordered piece stream
    (pieces joined by chr(31) within a word, words by chr(30)) — the
    cross-engine proof both Viterbi decoders chose the byte-identical
    segmentation, piece for piece. Mirrored by
    ``oracle.unigram_tokenize_sql`` (recursive-CTE lattice enumeration
    over the DISTINCT pre-token vocabulary + row_number on the same
    (cost, n_pieces, path) keys)."""
    enc = unigram_encode_udf(
        vocab, max_piece_len=max_piece_len, oov_cost=oov_cost
    )
    out = df.select(
        F.col(id_col), pretokenize(F.col(text_col)).alias("__ws")
    ).withColumn("__e", enc(F.col("__ws")))
    return out.select(
        F.col(id_col),
        F.size("__ws").alias("n_words"),
        F.col("__e.n_pieces").alias("n_pieces"),
        F.col("__e.total_cost").alias("total_cost"),
        F.md5(F.concat_ws(_WSEP, F.col("__e.paths"))).alias("piece_md5"),
    )


@lru_cache(maxsize=4)
def seed_vocab(
    vocab_size: int = 120, max_piece_len: int = 6, em_iterations: int = 3
) -> tuple[tuple[str, int], ...]:
    """Fixed vocabulary trained (pure Python, no Spark) on the embedded
    seed corpus shared with ``bpe.seed_merges`` — available to
    ``oracle_sql()`` without a SparkSession, the "tokenizer trained
    offline, applied everywhere" shape of real pipelines."""
    import re as _re

    counts: Counter = Counter()
    # ASCII-equivalent pre-tokenizer, same caveat as bpe.seed_merges
    for m in _re.finditer(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+", _SEED_TEXT):
        counts[m.group(0)] += 1
    return tuple(
        train_unigram(
            dict(counts),
            vocab_size=vocab_size,
            max_piece_len=max_piece_len,
            em_iterations=em_iterations,
        )
    )
