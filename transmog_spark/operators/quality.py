"""Composite document quality gate — the Gopher-rules verdict table.

One operator that answers the question every curation pipeline asks
first: *keep this document or drop it, and why?* Combines the signal
formulas of text_profile (length/stopword/punct shape),
repetition_profile (Gopher repetition rules), lm_score (CCNet
perplexity) and pii_counts (PII density) into a single per-doc verdict
with a fixed rule-precedence CASE, so the drop reason is deterministic
and auditable (Rae et al. 2021 Gopher §A.1.1; Wenzek et al. 2019 CCNet).

Scale shape (fused): exactly TWO passes over the corpus —

* **token pass** — 1-grams and 2-grams are built per row as one tagged
  array (the same zip_with gram expressions the standalone operators
  use) and exploded ONCE; gram-level counts groupBy (id, n, md5-hash)
  with map-side combine; the bigram-LM count tables LEFT-join onto that
  same frame (non-bigram rows carry a synthetic trailing-space key that
  can never equal a model bigram or context token, so they pass through
  unmatched without a null-key hotspot); then ONE per-doc groupBy
  computes every token metric AND the scaled-integer logp sums.
* **raw-text pass** — chars / punctuation / PII as pure Column exprs.

The previous composition (text_profile + repetition_profile + lm_score
+ pii joined on the id spine) scanned the corpus 5 times for one
verdict column; this is the same verdict table from 2 scans
(plan-pinned by tests/test_plan_quality.py::
test_quality_gate_two_corpus_scans). Self-training the LM adds the two
bounded ngram_lm_counts passes over the train split — production passes
``lm_model`` and pays none.

Cross-engine determinism: every metric compared is one the per-operator
oracles already hash bit-identically (ppl's scaled-integer grid, the
ratio doubles), so rule comparisons resolve identically in the DuckDB
mirror (``oracle.quality_gate_sql``). Gram counts group on the shared
60-bit md5 — the repetition oracle's own equivalence class — so the LM
term scores a hash-merged gram once; this diverges from per-string
grouping only on an in-document 60-bit collision (~2^-40 per corpus at
any testable scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.lm import LM_K, _avg_e4, ngram_lm_counts
from transmog_spark.operators.pii import pii_counts
from transmog_spark.operators.text import EN_STOPWORDS, word_ngrams, ws_tokens

# Rule precedence — first failing rule names the verdict.
RULES = (
    "too_short",
    "word_shape",
    "punct_heavy",
    "low_stopword",
    "repetitive",
    "high_ppl",
    "pii_heavy",
)


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 20,
    min_word_len: float = 2.0,
    max_word_len: float = 12.0,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.02,
    max_top2gram: float = 0.15,
    max_ppl: float = 31.5,
    max_pii: int = 3,
    lm_train_pct: int = 80,
    lm_model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-doc verdict table: (id, n_tokens_ws, stopword_ratio,
    top_2gram_frac, ppl, n_pii, verdict) where verdict is 'keep' or the
    first failing rule name in RULES order. Metrics for docs a rule never
    reaches (e.g. ppl of a 1-token doc) are 0-coalesced, never null.
    ``lm_model`` (an ``ngram_lm_counts`` triple) scores perplexity against
    a pre-trained reference model instead of self-training — the streaming
    / train-once shape.

    Formula parity: the metric expressions below are EXACT mirrors of
    text_profile / repetition_profile / lm_score (same op order on the
    same types) — keep them in lockstep with those operators and with
    ``oracle.quality_gate_sql``.
    """
    bigram_counts, context_counts, vocab = lm_model or ngram_lm_counts(
        df, id_col, text_col, train_pct=lm_train_pct
    )
    k = LM_K
    t = F.col(text_col)
    toks = ws_tokens(t)

    # ---- token pass: one explode of tagged 1/2-grams -------------------
    def _tagged(gram_n: int):
        return F.transform(
            word_ngrams(toks, gram_n),
            lambda g: F.struct(F.lit(gram_n).alias("gn"), g.alias("g")),
        )

    # explode_outer + isNotNull on the GENERATED attribute: inner explode
    # makes Catalyst infer a size>0 filter that re-evaluates the whole
    # tagged-gram expression at the scan (dedup.minhash_signatures note);
    # struct elements are never NULL, so the post-generate filter drops
    # exactly the outer-added rows of empty-token docs.
    exploded = df.select(
        F.col(id_col),
        F.explode_outer(F.concat(_tagged(1), _tagged(2))).alias("x"),
    ).where(F.col("x").isNotNull()).select(
        id_col, F.col("x.gn").alias("gn"), F.col("x.g").alias("g")
    )
    grams = exploded.groupBy(
        id_col, "gn", md5_long(F.col("g")).alias("gh")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.max("g").alias("rep"),
    )

    # LM count-table joins, folded in BEFORE the per-doc rollup so 1-gram
    # rows ride along instead of forcing a second corpus branch. Non-bigram
    # rows get a synthetic '<gh> ' key: it ends with a space, and model
    # bigrams ("w1 w2") / context tokens ("w1") never do (ws_tokens yields
    # non-empty space-free tokens) — unmatched by construction, and the
    # gh-derived key spreads them across partitions (no null-key hotspot).
    is2 = F.col("gn") == 2
    synth = F.concat(F.col("gh").cast("string"), F.lit(" "))
    keyed = grams.select(
        "*",
        F.when(is2, F.col("rep")).otherwise(synth).alias("__jk"),
        F.when(is2, F.substring_index("rep", " ", 1))
        .otherwise(synth)
        .alias("__w1k"),
    )
    joined = (
        keyed.join(
            bigram_counts.select(F.col("gram").alias("__jk"), "c2"),
            "__jk",
            "left",
        )
        .join(
            context_counts.select(F.col("w1").alias("__w1k"), "c1"),
            "__w1k",
            "left",
        )
        .crossJoin(F.broadcast(vocab))
    )
    # EXACT lm_score mirror: per-distinct-gram round(logp,4) scaled-integer
    # terms, weighted by multiplicity
    logp = F.log(
        (F.coalesce("c2", F.lit(0)) + F.lit(k))
        / (
            F.coalesce("c1", F.lit(0))
            + F.lit(k) * F.greatest(F.col("vocab_size"), F.lit(1))
        )
    )
    is1 = F.col("gn") == 1
    c = F.col("c")
    roll = joined.groupBy(id_col).agg(
        F.sum(F.when(is1, c)).alias("__n_words"),
        F.sum(F.when(is1, c * F.length("rep"))).alias("__sum_len"),
        F.sum(
            F.when(
                is1,
                F.when(F.col("rep").isin(EN_STOPWORDS), c).otherwise(F.lit(0)),
            )
        ).alias("__n_stop"),
        F.max(F.when(is2, c)).alias("__t2_max"),
        F.sum(F.when(is2, c)).cast("long").alias("__n_bigrams"),
        F.sum(F.when(is2, F.round(logp * 10000).cast("long") * c)).alias(
            "__slp"
        ),
    )
    roll = roll.withColumn("__avg_e4", _avg_e4("__slp", "__n_bigrams"))

    # ---- raw-text pass: chars / punct / PII as Column exprs -------------
    counts = pii_counts(t)
    n_pii = None
    for pc in counts.values():
        n_pii = pc if n_pii is None else n_pii + pc
    passb = df.select(
        F.col(id_col),
        F.length(t).alias("__n_chars"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0))).alias(
            "__n_punct"
        ),
        n_pii.alias("__n_pii"),
    )

    j = passb.join(roll, id_col, "left")
    n = F.coalesce(F.col("__n_words"), F.lit(0))
    stopword_ratio = F.when(
        n > 0, F.coalesce(F.col("__n_stop"), F.lit(0)).cast("double") / n
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n > 0, F.coalesce(F.col("__sum_len"), F.lit(0)).cast("double") / n
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("__n_chars") > 0,
        F.col("__n_punct").cast("double") / F.col("__n_chars"),
    ).otherwise(F.lit(0.0))
    top2 = F.round(
        F.coalesce(
            (F.col("__t2_max") * 2).cast("double") / F.col("__n_words"),
            F.lit(0.0),
        ),
        4,
    )
    ppl = F.coalesce(
        F.round(F.exp(-(F.col("__avg_e4") / F.lit(10000.0))), 2), F.lit(0.0)
    )
    verdict = (
        F.when(n.cast("int") < min_tokens, "too_short")
        .when(
            (mean_word_len < min_word_len) | (mean_word_len > max_word_len),
            "word_shape",
        )
        .when(punct_ratio > max_punct_ratio, "punct_heavy")
        .when(stopword_ratio < min_stopword_ratio, "low_stopword")
        .when(top2 > max_top2gram, "repetitive")
        .when(ppl > max_ppl, "high_ppl")
        .when(F.col("__n_pii") > max_pii, "pii_heavy")
        .otherwise("keep")
    )
    return j.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens_ws"),
        stopword_ratio.alias("stopword_ratio"),
        top2.alias("top_2gram_frac"),
        ppl.alias("ppl"),
        F.col("__n_pii").cast("long").alias("n_pii"),
        verdict.alias("verdict"),
    )


def quality_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    source_col: str = "source",
    **gate_kwargs,
) -> DataFrame:
    """Per-source quality-gate telemetry: which rule rejects how much of
    each source — the FineWeb/CCNet-style filter-ablation table that turns
    a per-doc verdict column into the number a pipeline owner actually
    reads ("source X loses 40% to stopword_ratio; retune or drop X").

    One row per (source, verdict): n docs, the source's total, and the
    exact-fraction share (round-4 of BIGINT/BIGINT — engine-identical).
    Scale shape: the gate's own documented scans plus one id-keyed join to
    the (id, source) spine and two map-side-combined aggs over
    |sources|x|rules| rows; the report adds no corpus-wide shuffle beyond
    the gate's.
    """
    gated = quality_gate(df, id_col, text_col, **gate_kwargs)
    j = gated.select(F.col(id_col), "verdict").join(
        df.select(F.col(id_col), F.col(source_col)), id_col
    )
    per = j.groupBy(source_col, "verdict").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per.groupBy(source_col).agg(F.sum("n").cast("long").alias("n_source"))
    return per.join(tot, source_col).select(
        F.col(source_col),
        F.col("verdict"),
        F.col("n"),
        F.col("n_source"),
        F.round(F.col("n") / F.col("n_source"), 4).alias("frac"),
    )


# terminal-punctuation line rule: ASCII '.', '!', '?', optionally followed
# by a closing double quote (the C4 paper's "terminal punctuation mark
# (i.e. a period, exclamation mark, question mark, or end quotation
# mark)"). RE2-safe, identical pattern string in the DuckDB mirror.
C4_TERMINAL_RE = '[.!?]"?$'


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """The C4 heuristic cleaning pass (Raffel et al. 2020 §2.2) — the
    named line/page filter set every web-crawl recipe starts from,
    complementing the statistical ``quality_gate``:

    * keep only lines that END in a terminal punctuation mark and carry
      at least ``min_words_per_line`` whitespace words;
    * drop any line containing the word "javascript" (case-insensitive);
    * drop the whole page if it contains "lorem ipsum" (boilerplate
      placeholder), a '{' (leaked code), any ``blocklist`` word
      (word-boundary match, the paper's bad-words list — pass your own),
      or fewer than ``min_sentences`` terminal-punctuated sentences after
      line cleaning.

    Verdict precedence (fixed, first match): drop_lorem > drop_brace >
    drop_blocklist > drop_short > keep — page-level rules fire on the RAW
    text, the sentence floor on the CLEANED text, as in the paper.

    Output: (id, verdict, n_lines, n_lines_kept, n_sentences, text =
    the cleaned page — joined kept lines — for kept pages, NULL
    otherwise). Pure Column regexps (RE2-safe: no lookaround), one
    narrow pass, ZERO shuffles; a plan test pins it.
    """
    lines = F.split(F.col(text_col), "\n")

    def line_ok(l):
        t = F.trim(l)
        return (
            t.rlike(C4_TERMINAL_RE)
            & (F.size(F.filter(F.split(t, r"\s+"), lambda w: w != "")) >= min_words_per_line)
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    cleaned = F.array_join(kept, "\n")
    n_sent = F.size(
        F.regexp_extract_all(cleaned, F.lit('[^.!?]*[.!?]"?'), F.lit(0))
    ) - F.size(
        F.filter(
            F.regexp_extract_all(cleaned, F.lit('[^.!?]*[.!?]"?'), F.lit(0)),
            lambda s: F.trim(s) == "",
        )
    )
    low = F.lower(F.col(text_col))
    block_hit = F.lit(False)
    import re as _re

    for w in blocklist:
        # escape: a blocklist entry with regex metacharacters must match
        # literally, not alter the pattern (Python re.escape emits only
        # backslash-escapes, which Java regex accepts identically).
        # \b only exists between a word and a non-word char, so anchor
        # only the edges that ARE word characters ('c++' gets a leading
        # \b but no trailing one — there is no boundary between '+' and
        # a following space)
        lead = r"\b" if (w and (w[0].isalnum() or w[0] == "_")) else ""
        trail = r"\b" if (w and (w[-1].isalnum() or w[-1] == "_")) else ""
        block_hit = block_hit | low.rlike(f"{lead}{_re.escape(w)}{trail}")
    staged = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        cleaned.alias("__cleaned"),
        n_sent.alias("n_sentences"),
        F.when(low.contains("lorem ipsum"), F.lit("drop_lorem"))
        .when(low.contains("{"), F.lit("drop_brace"))
        .when(block_hit, F.lit("drop_blocklist"))
        .otherwise(F.lit("")).alias("__page_verdict"),
    )
    verdict = F.when(F.col("__page_verdict") != "", F.col("__page_verdict")).otherwise(
        F.when(F.col("n_sentences") < min_sentences, F.lit("drop_short")).otherwise(
            F.lit("keep")
        )
    )
    return staged.select(
        F.col(id_col),
        verdict.alias("verdict"),
        "n_lines",
        "n_lines_kept",
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.when(verdict == "keep", F.col("__cleaned")).alias(text_col),
    )
