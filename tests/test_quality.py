"""Composite quality gate: rule precedence and verdict correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.quality import quality_gate

COMMON = "the cat sat on a mat and the dog ran to it as we saw that day"

DOCS = {
    # 5 tokens -> too_short fires before anything else
    0: "zz xx yy ww vv",
    # >= 20 tokens, every word 1 char -> mean_word_len < 2 -> word_shape
    1: " ".join(["a"] * 25),
    # 20 ws tokens (2 words + 18 punct blobs) drowning in punctuation
    2: ("the ok " + "!!!???;;; " * 18).strip(),
    # >= 20 distinct alphabetic tokens, zero stopwords -> low_stopword
    3: " ".join(f"word{chr(97 + i)}xyz" for i in range(22)),
    # stopword-rich but one dominant bigram -> repetitive
    4: "the cat " * 15,
    # clean doc: stopwords, varied words, no pii -> keep
    5: COMMON + " while birds fly over green hills near quiet rivers",
    # clean doc + 4 emails -> pii_heavy
    6: COMMON + " a@b.co c@d.co e@f.co g@h.co",
}


def _verdicts(spark, **kw):
    df = spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")
    rows = quality_gate(df, **kw).collect()
    return {r["doc_id"]: r for r in rows}


def test_rule_precedence_and_verdicts(spark):
    # max_ppl huge so the perplexity rule never fires on this tiny corpus
    got = _verdicts(spark, max_ppl=1e9)
    assert got[0]["verdict"] == "too_short"
    assert got[1]["verdict"] == "word_shape"
    assert got[2]["verdict"] == "punct_heavy"
    assert got[3]["verdict"] == "low_stopword"
    assert got[4]["verdict"] == "repetitive"
    assert got[5]["verdict"] == "keep"
    assert got[6]["verdict"] == "pii_heavy"
    assert got[6]["n_pii"] == 4
    # every doc present exactly once with its metrics populated
    assert len(got) == len(DOCS)
    assert got[0]["ppl"] is not None  # 0-coalesced, never null


def test_ppl_rule_fires_when_tightened(spark):
    # max_ppl=0 makes perplexity the first failing rule for any doc that
    # survives the earlier rules
    got = _verdicts(spark, max_ppl=0.0)
    assert got[5]["verdict"] == "high_ppl"
    # earlier rules still win precedence
    assert got[0]["verdict"] == "too_short"
    assert got[4]["verdict"] == "repetitive"


def test_keep_fraction_nontrivial_on_corpus(spark, sf_dir):
    """On the synthetic corpus the default thresholds must neither pass nor
    reject everything — the gate is a filter, not a constant."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r["verdict"]: r["n"]
        for r in quality_gate(d).groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert 0 < counts.get("keep", 0) < total
