"""Text analysis for training-data pipelines.

Language-ID (stopword/n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting (order-aware rolling
hash). All pure Column expressions; every formula is mirrored 1:1 in the
DuckDB oracle SQL (same md5-based hash, same stopword lists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
# Deliberately short (they get embedded into oracle SQL literals too).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is", "in", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}

# BPE-ish pre-tokenizer: word pieces or single non-space symbols
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

EN_STOPWORDS = LANG_MARKERS["en"]


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via regexp extraction (word pieces + symbols)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_REGEX), F.lit(0)))


def _contains_any(marker_arr: Column):
    # factory, not a 2-param lambda: PySpark HOFs pass the element index to
    # any 2-parameter callable (default args count as parameters)
    return lambda t: F.array_contains(marker_arr, t)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker hit counts over whitespace tokens."""
    toks = ws_tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, _contains_any(marker_arr)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by marker hits; 'und' (undetermined) when all zero.

    Ties break by fixed language order (en, de, fr, es) — deterministic and
    reproducible in SQL as a CASE chain.
    """
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in ("es", "fr", "de", "en"):  # reverse priority; later wins ties via >=
        s = scores[lang]
        cond = s > 0
        best = F.when(cond & (s >= best_score), F.lit(lang)).otherwise(best)
        best_score = F.when(cond & (s >= best_score), s).otherwise(best_score)
    return best


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    toks = ws_tokens(text)
    n = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0)))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_word_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / n,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n,
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0)),
        "mean_word_len": mean_word_len,
    }


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: rewards stopword presence and sane word
    lengths, penalizes punctuation soup. A heuristic, not a model."""
    q = quality_features(text)
    len_ok = F.when((q["mean_word_len"] >= 2.0) & (q["mean_word_len"] <= 12.0), 1.0).otherwise(0.3)
    stop_ok = F.least(q["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - q["punct_ratio"] * 5.0)
    return (len_ok * 0.3 + stop_ok * 0.4 + punct_pen * 0.3).cast("double")


MOD_P = 1_000_000_007


def fingerprint(text: Column) -> Column:
    """Order-aware document fingerprint: sum of h(pos#token) mod p.

    Rolling-hash-equivalent (position-mixed), expressible identically in
    DuckDB via generate_subscripts + the shared md5 hash.
    """
    toks = ws_tokens(text)
    hashed = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: md5_long(F.concat(i.cast("string"), F.lit("#"), t)) % MOD_P,
    )
    total = F.aggregate(hashed, F.lit(0).cast("long"), lambda acc, h: (acc + h) % MOD_P)
    return F.when(F.size(toks) > 0, total).otherwise(F.lit(0).cast("long"))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per document: all text-analysis features."""
    t = F.col(text_col)
    q = quality_features(t)
    return df.select(
        F.col(id_col),
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        lang_id(t).alias("lang_pred"),
        q["n_chars"].alias("n_chars"),
        q["punct_ratio"].alias("punct_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["mean_word_len"].alias("mean_word_len"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
