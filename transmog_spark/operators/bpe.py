"""Byte-pair-encoding subword tokenizer: distributed train, distributed encode.

The real-tokenizer analog of the whitespace/regex token ops in
``operators/text.py`` (reference parity target: the reference has no
subword tokenizer — this is engine surface for the training-data tier).
Algorithm is the public BPE of Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units") with the GPT-2-style
regex pre-tokenizer, restricted to an RE2-compatible pattern so the
DuckDB oracle pre-tokenizes with the IDENTICAL pattern string.

Scale shape (100 TB posture):

* **training** aggregates word counts distributed (explode -> map-side
  combined groupBy), takes the top ``max_words`` by (count, word) via
  TakeOrdered, and runs the merge loop driver-side on that bounded
  word-count table — exactly how production tokenizers are trained
  (SentencePiece/HF train on a sample, not the full corpus). Driver
  state is ``max_words`` rows, independent of corpus size.
* **encoding** is a map-only pass: an Arrow-batched pandas UDF with a
  per-batch distinct-word cache (Zipf makes the cache hit rate extreme),
  no shuffle, no driver state. The merge table rides the closure
  (hundreds of entries — far below broadcast thresholds).

Cross-engine determinism: pre-tokenization uses one RE2-safe pattern
evaluated by Java regex (Spark) and RE2 (DuckDB); encoding applies
merges in rank order with non-overlapping left-to-right replacement —
mirrored in SQL by a recursive CTE over a boundary-safe separator
encoding (see ``oracle.bpe_tokenize_sql``). Training tie-breaks are
total-ordered (count desc, then lexicographically smallest pair).

Equivalence note (tested as a property in tests/test_bpe.py): applying
merges once each in rank order equals the classic
"repeatedly merge the lowest-rank pair present" encoder for any
training-consistent merge list, because a merge can only create pairs
whose merged element was built by an earlier-ranked merge — so a newly
created pair always ranks later than the merge that created it.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# RE2-compatible GPT-2-ish pre-tokenizer: a word = optional leading space +
# letters | digits | other-symbol run. Whitespace runs other than the single
# attached space are never matched (extract_all skips the gaps). No
# lookaround, no backreferences -> Java regex and RE2 agree on every match.
PRETOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def pretokenize(text: Column) -> Column:
    """Pre-token array (JVM-side regex, codegen'd)."""
    return F.regexp_extract_all(text, F.lit(PRETOKEN_RE), F.lit(0))


def _merge_seq(seq: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Merge all non-overlapping left-to-right (left, right) adjacencies."""
    out: list[str] = []
    i = 0
    n = len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_counts: dict[str, int], num_merges: int, *, min_count: int = 2
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a word-frequency table.

    Deterministic: each round picks the pair with the highest weighted
    count, ties broken by the lexicographically smallest (left, right).
    Stops early when no pair reaches ``min_count``. Incremental pair-count
    maintenance — only words containing the merged pair are re-sequenced.
    """
    seqs: dict[str, tuple[str, ...]] = {
        w: tuple(w) for w in word_counts if len(w) >= 2
    }
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[str]] = defaultdict(set)
    for w, seq in seqs.items():
        c = word_counts[w]
        for p in zip(seq, seq[1:]):
            pair_counts[p] += c
            pair_words[p].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        top = max(pair_counts.values())
        if top < min_count:
            break
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        for w in list(pair_words[best]):
            c = word_counts[w]
            old = seqs[w]
            new = _merge_seq(old, *best)
            seqs[w] = new
            for p in zip(old, old[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(w)
            for p in zip(new, new[1:]):
                pair_counts[p] += c
                pair_words[p].add(w)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic lowest-rank-first BPE encode — O(len^2), the fast path for
    short words (vs O(num_merges) for the rank-ordered pass)."""
    seq = tuple(word)
    while len(seq) > 1:
        pairs = [(ranks.get(p, 1 << 60), p) for p in zip(seq, seq[1:])]
        r, best = min(pairs)
        if r >= 1 << 60:
            break
        seq = _merge_seq(seq, *best)
    return list(seq)


def encode_word_rank_pass(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Rank-ordered single pass — the algorithm the DuckDB mirror runs.
    Equivalent to ``encode_word`` for training-consistent merge lists
    (property-tested); kept for the equivalence test and as documentation
    of the oracle's semantics."""
    seq = tuple(word)
    for left, right in merges:
        if len(seq) == 1:
            break
        seq = _merge_seq(seq, left, right)
    return list(seq)


def bpe_word_counts(
    df: DataFrame, text_col: str = "text", *, max_words: int = 30_000
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, bounded for the driver: explode
    pre-tokens, map-side-combined count, TakeOrdered top ``max_words`` by
    (count desc, word asc) — deterministic under any partitioning."""
    rows = (
        df.select(F.explode(pretokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 200,
    max_words: int = 30_000,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Train a BPE merge list on a corpus: distributed counts, driver loop."""
    return train_bpe(
        dict(bpe_word_counts(df, text_col, max_words=max_words)),
        num_merges,
        min_count=min_count,
    )


def bpe_encode_udf(merges: list[tuple[str, str]], *, single_eval: bool = True):
    """Arrow-batched encoder over a pre-token array column: returns the
    concatenated subword-token array for each row. Distinct words are
    encoded once per batch (Zipf -> near-total cache hits); the merge
    table is closure-captured (small).

    ``single_eval`` (default) marks the UDF non-deterministic — it IS
    deterministic, but the marking is an optimizer barrier: when a
    downstream plan references the token array more than once (a filter on
    its size plus a projection, as in token_chunks), CollapseProject
    otherwise inlines the UDF into every use and the encoder runs once per
    reference (measured: 2 ArrowEvalPython nodes -> 1). The cost is that
    unrelated filters no longer reorder below the encode — filter before
    encoding, which a 100 TB pipeline should do anyway. Pass
    ``single_eval=False`` to restore full optimizer freedom."""
    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def _encode(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(ws):
            out: list[str] = []
            for w in ws:
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        return words.apply(enc)

    return _encode.asNondeterministic() if single_eval else _encode


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc subword tokenization summary: (id, n_words, n_tokens,
    tok_md5) where tok_md5 hashes the full ordered token stream joined by
    chr(30) — the cross-engine proof that both encoders produced the
    byte-identical token sequence. Docs whose text contains chr(30)/chr(31)
    still hash identically on both engines (the separators are applied to
    the same strings); only the human-readability of the joined stream
    degrades.
    """
    enc = bpe_encode_udf(merges)
    out = df.select(
        F.col(id_col), pretokenize(F.col(text_col)).alias("__ws")
    ).withColumn("__toks", enc(F.col("__ws")))
    return out.select(
        F.col(id_col),
        F.size("__ws").alias("n_words"),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(chr(30), F.col("__toks"))).alias("tok_md5"),
    )


# ---------------------------------------------------------------------------
# Fixed seed tokenizer: trained once (pure Python, no Spark) on a
# deterministic embedded corpus, so the same merge table is available to
# oracle_sql() without running Spark — the "tokenizer trained offline,
# applied everywhere" shape of real pipelines.
# ---------------------------------------------------------------------------

_SEED_TEXT = """
the quick brown fox jumps over the lazy dog and the dog sleeps
a training corpus needs the most common words repeated many times
the tokenizer learns merges from the counts of adjacent characters
language models read tokens not characters so the tokens matter
the data pipeline filters scores packs and shuffles the documents
spark executes the plan across many executors with partitioned data
processing processing processing the the the and and and of of of
in in to to it it is is that that for for was was with with as as
numbers like 1234 and 567890 split into digit runs under the rule
punctuation, however: stays! separate? (mostly) -- see the pattern
international words also appear here and there in the long corpus
distributed systems shuffle partitions and aggregate partial sums
the engine reads parquet writes parquet and checks every checksum
quality scoring uses perplexity and repetition and stopword ratios
deduplication removes near duplicate documents from the training set
the model trains on packed sequences of a fixed context length
"""

SEED_NUM_MERGES = 200


@lru_cache(maxsize=4)
def seed_merges(num_merges: int = SEED_NUM_MERGES) -> tuple[tuple[str, str], ...]:
    """The fixed merge table (deterministic, computed at first use)."""
    counts: Counter = Counter()
    import re as _re

    # pure-Python pre-tokenizer equivalent for the ASCII seed text: the
    # \p classes only matter for non-ASCII input, which the seed avoids
    for m in _re.finditer(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+", _SEED_TEXT):
        counts[m.group(0)] += 1
    return tuple(train_bpe(dict(counts), num_merges, min_count=2))


def tokenizer_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    source_col: str = "source",
) -> DataFrame:
    """Per-source tokenizer-QA report: fertility (subword pieces per word
    — the standard "is this tokenizer a good fit for this domain" number;
    multilingual BERT's ~1.1-2.8 range made it famous) and compression
    (characters per token). A domain whose fertility spikes is getting
    shredded into char-level pieces — retrain the merges or re-balance the
    training corpus before paying 2x the sequence length at pre-training.

    All aggregates are exact BIGINT sums (word/token/char counts from the
    Arrow-batched encoder), divisions round-4 on identical integers —
    engine-identical. Sources with zero words report NULL fertility
    rather than a division error. Scale shape: the encoder's one
    partition-preserving pass plus one id-keyed join to the (id, source,
    chars) projection and a |sources|-row agg.

    Output: (source, n_docs, n_words, n_tokens, fertility,
    chars_per_token).
    """
    toks = bpe_tokenize(df, merges, id_col, text_col)
    spine = df.select(
        F.col(id_col),
        F.col(source_col),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
    )
    j = toks.join(spine, id_col)
    agg = j.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("__chars").cast("long").alias("__sum_chars"),
    )
    return agg.select(
        F.col(source_col),
        "n_docs",
        "n_words",
        "n_tokens",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_tokens") / F.col("n_words"), 4),
        ).alias("fertility"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("__sum_chars") / F.col("n_tokens"), 4),
        ).alias("chars_per_token"),
    )
