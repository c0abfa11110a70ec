"""Duplicated-span detection/removal: planted substring duplicates."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from transmog_spark.operators.spans import duplicate_spans, strip_duplicate_spans

BOILER = "all rights reserved click here to accept cookies and continue reading"  # 12 tokens
UNIQ_A = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
UNIQ_B = "kilo lima mike november oscar papa quebec romeo sierra tango"

DOCS = {
    # boilerplate at the TAIL of doc 0 and the HEAD of doc 1
    0: UNIQ_A + " " + BOILER,
    1: BOILER + " " + UNIQ_B,
    # fully unique doc: no spans
    2: "uniform victor whiskey xray yankee zulu one two three four five six",
    # doc that IS the boilerplate twice (within-doc duplication counts too)
    3: BOILER + " " + BOILER,
}


def _df(spark):
    return spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")


def test_duplicate_spans_positions(spark):
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(_df(spark), n=8, min_count=2).collect()
    }
    n_boiler = len(BOILER.split())
    n_a, n_b = len(UNIQ_A.split()), len(UNIQ_B.split())
    # doc 0: boilerplate spans its last 12 tokens
    assert spans[0] == (n_a, n_a + n_boiler - 1, n_boiler)
    # doc 1: boilerplate spans its first 12 tokens
    assert spans[1] == (0, n_boiler - 1, n_boiler)
    # doc 2 has no duplicated 8-gram
    assert 2 not in spans
    # doc 3: the two copies overlap-merge into ONE maximal span covering all
    assert spans[3] == (0, 2 * n_boiler - 1, 2 * n_boiler)


def test_strip_duplicate_spans_fingerprints(spark):
    got = {
        r["doc_id"]: r
        for r in strip_duplicate_spans(_df(spark), n=8, min_count=2).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 0 keeps exactly its unique head
    assert got[0]["n_removed"] == len(BOILER.split())
    assert got[0]["clean_md5"] == md5(UNIQ_A)
    # doc 1 keeps exactly its unique tail
    assert got[1]["clean_md5"] == md5(UNIQ_B)
    # doc 2 untouched
    assert got[2]["n_removed"] == 0
    assert got[2]["clean_md5"] == md5(DOCS[2])
    # doc 3 entirely removed -> md5 of the empty string
    assert got[3]["n_removed"] == got[3]["n_tok"]
    assert got[3]["clean_md5"] == md5("")


def test_min_count_3_spares_pairs(spark):
    # the boilerplate occurs 4x corpus-wide (docs 0, 1, and 2x in doc 3) so
    # it still trips min_count=3; a pair-only duplicate would not
    df = _df(spark).where(F.col("doc_id").isin([0, 1]))
    spans = duplicate_spans(df, n=8, min_count=3).collect()
    assert spans == []
