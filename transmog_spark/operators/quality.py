"""Composite document quality gate — the Gopher-rules verdict table.

One operator that answers the question every curation pipeline asks
first: *keep this document or drop it, and why?* Combines the
already-gated signal operators — text_profile (length/stopword/punct
shape), repetition_profile (Gopher repetition rules), lm_score (CCNet
perplexity), pii_profile (PII density) — into a single per-doc verdict
with a fixed rule-precedence CASE, so the drop reason is deterministic
and auditable (Rae et al. 2021 Gopher §A.1.1; Wenzek et al. 2019 CCNet).

Scale shape: four independent per-doc aggregations, each already
scale-shaped (explode-once + map-side partials), joined on the id key —
co-partitioned after the first shuffle, no new scale hazards. The
verdict CASE is a pure Column expression.

Cross-engine determinism: every metric compared is one the per-operator
oracles already hash bit-identically (ppl's scaled-integer grid, the
ratio doubles), so rule comparisons resolve identically in the DuckDB
mirror (``oracle.quality_gate_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transmog_spark.operators.lm import lm_score
from transmog_spark.operators.pii import pii_counts
from transmog_spark.operators.text import repetition_profile, text_profile

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
    / train-once shape."""
    tp = text_profile(df, id_col, text_col).select(
        id_col, "n_tokens_ws", "stopword_ratio", "punct_ratio", "mean_word_len"
    )
    rp = repetition_profile(df, id_col, text_col).select(id_col, "top_2gram_frac")
    lm = lm_score(
        df, id_col, text_col, train_pct=lm_train_pct, model=lm_model
    ).select(id_col, "ppl")
    counts = pii_counts(F.col(text_col))
    n_pii = None
    for c in counts.values():
        n_pii = c if n_pii is None else n_pii + c
    pii = df.select(F.col(id_col), n_pii.alias("n_pii"))

    j = (
        df.select(id_col)
        .join(tp, id_col)
        .join(rp, id_col, "left")
        .join(lm, id_col, "left")
        .join(pii, id_col)
    )
    top2 = F.coalesce(F.col("top_2gram_frac"), F.lit(0.0))
    ppl = F.coalesce(F.col("ppl"), F.lit(0.0))
    verdict = (
        F.when(F.col("n_tokens_ws") < min_tokens, "too_short")
        .when(
            (F.col("mean_word_len") < min_word_len)
            | (F.col("mean_word_len") > max_word_len),
            "word_shape",
        )
        .when(F.col("punct_ratio") > max_punct_ratio, "punct_heavy")
        .when(F.col("stopword_ratio") < min_stopword_ratio, "low_stopword")
        .when(top2 > max_top2gram, "repetitive")
        .when(ppl > max_ppl, "high_ppl")
        .when(F.col("n_pii") > max_pii, "pii_heavy")
        .otherwise("keep")
    )
    return j.select(
        F.col(id_col),
        "n_tokens_ws",
        "stopword_ratio",
        top2.alias("top_2gram_frac"),
        ppl.alias("ppl"),
        F.col("n_pii").cast("long").alias("n_pii"),
        verdict.alias("verdict"),
    )
