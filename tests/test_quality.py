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


def test_quality_report_covers_every_doc_and_sums(spark):
    """Every doc lands in exactly one (source, verdict) cell — empty and
    1-token docs included — and per-source fracs sum to 1."""
    from transmog_spark.operators.quality import quality_report

    long_ok = (
        "the quick brown fox jumps over the lazy dog because it is a "
        "fine day today and tomorrow will be better than yesterday was"
    )
    rows = [
        (0, "", "a"),
        (1, "one", "a"),
        (2, long_ok, "a"),
        (3, long_ok, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = quality_report(df).collect()
    assert sum(r.n for r in out) == 4
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, cells in by_src.items():
        assert sum(c.n for c in cells) == cells[0].n_source
        assert abs(sum(c.frac for c in cells) - 1.0) < 1e-6
    a = {r.verdict: r.n for r in by_src["a"]}
    assert a["too_short"] == 2 and a.get("keep") == 1


def test_contamination_report_short_docs_count_clean(spark):
    """Docs with < n tokens emit no n-grams but still appear in the
    denominator as clean; flagged = contamination > threshold."""
    from transmog_spark.operators.corpus import contamination_report

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta", "bench")],
        "doc_id long, text string, source string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon", "a"),  # contaminated
            (1, "zz yy xx ww vv uu", "a"),               # clean
            (2, "hi", "a"),                               # gram-less
            (3, "alpha beta gamma", "b"),                 # exact bench 3-gram
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in contamination_report(corpus, bench, n=3).collect()}
    assert out["a"].n_docs == 3 and out["a"].n_flagged == 1
    assert abs(out["a"].flag_rate - round(1 / 3, 4)) < 1e-9
    assert out["b"].n_docs == 1 and out["b"].n_flagged == 1
    assert out["b"].max_contamination == 1.0


def test_curation_funnel_monotone_and_consistent_with_flagship(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = sorted(
        entrymod.queries()["curation_funnel"](spark, sf_dir).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in rows] == [
        "raw",
        "bench_holdout_removed",
        "quality_decontaminated",
        "exact_dedup",
        "near_dedup",
        "span_stripped",
    ]
    # docs never increase through the funnel; drop accounting is exact
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_docs <= prev.n_docs
        assert cur.drop_docs == prev.n_docs - cur.n_docs
        if prev.n_docs > 0:
            assert abs(cur.drop_frac - (prev.n_docs - cur.n_docs) / prev.n_docs) < 5e-5
    assert rows[0].drop_docs is None and rows[0].drop_frac is None
    # span strip removes tokens, never docs' worth of tokens it didn't have
    assert rows[5].n_tokens <= rows[4].n_tokens
    # final stage == the packing flagship's distinct doc set
    pack_docs = (
        entrymod.queries()["curation_pipeline"](spark, sf_dir)
        .select("doc_id")
        .distinct()
        .count()
    )
    assert rows[5].n_docs == pack_docs


def test_c4_clean_rules(spark):
    from transmog_spark.operators.quality import c4_clean

    rows = [
        (1, 'Good first line here.\nshort.\nNo terminal punct line\n'
            'Another good sentence here! Fine "quoted end."\n'
            'This uses javascript today.\nFifth real sentence stays.\n'
            'Sixth one also stays.'),
        (2, 'Lorem ipsum dolor sit amet.\nA fine sentence here.'),
        (3, 'Code page { int x = 0; }\nGood sentence here.'),
        (4, 'Only two sentences total.\nHere is number two.'),
        (5, 'bad word page is here.\nMore text follows here.\n'
            'And more text here.\nAnd a fourth one here.\nAnd a fifth here.'),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in c4_clean(df, blocklist=("bad",)).collect()}
    r1 = out[1]
    assert r1.verdict == "keep"
    # drops: 1-word 'short.', unpunctuated line, javascript line
    assert r1.n_lines == 7 and r1.n_lines_kept == 4
    assert r1.n_sentences == 5  # the quoted line carries two sentences
    assert "javascript" not in r1.text and "short." not in r1.text
    assert out[2].verdict == "drop_lorem" and out[2].text is None
    assert out[3].verdict == "drop_brace"
    assert out[4].verdict == "drop_short"
    assert out[5].verdict == "drop_blocklist"


def test_c4_clean_precedence_and_counts(spark):
    from transmog_spark.operators.quality import c4_clean

    # lorem beats brace beats blocklist; empty page -> 0 sentences
    df = spark.createDataFrame(
        [(1, "lorem ipsum { bad }"), (2, "")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in c4_clean(df, blocklist=("bad",)).collect()}
    assert out[1].verdict == "drop_lorem"
    assert out[2].verdict == "drop_short" and out[2].n_sentences == 0


def test_c4_clean_blocklist_metacharacters_literal(spark):
    from transmog_spark.operators.quality import c4_clean

    # 'c++' must match literally, not as a regex; and must NOT match 'c'
    df = spark.createDataFrame(
        [(1, "we write c++ here daily."), (2, "plain c code only here.")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.verdict for r in c4_clean(df, blocklist=("c++",), min_sentences=1).collect()}
    assert out[1] == "drop_blocklist"
    assert out[2] == "keep"


def test_curation_funnel_tokens_conserved_by_packing(spark, sf_dir):
    # cross-operator invariant: the funnel's final-stage token total must
    # equal the packing flagship's total span length — pack_concat
    # CONSERVES tokens exactly (every kept token lands in exactly one span)
    import pyspark.sql.functions as SF

    import __spark_entry__ as entrymod

    funnel = {
        r.stage: r
        for r in entrymod.queries()["curation_funnel"](spark, sf_dir).collect()
    }
    packed_tokens = (
        entrymod.queries()["curation_pipeline"](spark, sf_dir)
        .agg(SF.sum("span_len"))
        .collect()[0][0]
    )
    assert funnel["span_stripped"].n_tokens == packed_tokens
