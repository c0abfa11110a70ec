"""cooc_pairs / ngram_diversity unit tests (hand-computed)."""

from __future__ import annotations

import math

import pytest


def test_cooc_pairs_hand_computed(spark):
    from transmog_spark.operators.cooc import cooc_pairs

    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    rows = cooc_pairs(df, window=1, min_count=1, k=10).collect()
    # adjacent pairs: (a,b) (b,a) (a,b) -> canonical (a,b) x3; n_tok=4,
    # c_a=c_b=2 -> PMI = ln(3*4/(2*2)) = ln 3
    assert len(rows) == 1
    r = rows[0]
    assert (r["tok_a"], r["tok_b"], r["c_ab"], r["c_a"], r["c_b"]) == (
        "a", "b", 3, 2, 2,
    )
    assert abs(r["pmi"] - round(math.log(3.0), 4)) <= 1e-9
    assert r["rank"] == 1

    # window=2 adds the distance-2 self pairs (a,a), (b,b)
    rows2 = {
        (r["tok_a"], r["tok_b"]): r["c_ab"]
        for r in cooc_pairs(df, window=2, min_count=1, k=10).collect()
    }
    assert rows2 == {("a", "b"): 3, ("a", "a"): 1, ("b", "b"): 1}


def test_cooc_pairs_no_phantom_tail_pairs(spark):
    # regression: zip tail padding must NOT become self-pairs (Spark
    # least/greatest skip nulls) — a 2-token doc with window=5 has exactly
    # one pair
    from transmog_spark.operators.cooc import cooc_pairs

    df = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    rows = cooc_pairs(df, window=5, min_count=1, k=10).collect()
    assert [(r["tok_a"], r["tok_b"], r["c_ab"]) for r in rows] == [("x", "y", 1)]


def test_cooc_pairs_min_count_and_validation(spark):
    from transmog_spark.operators.cooc import cooc_pairs

    df = spark.createDataFrame(
        [(1, "p q p q p q"), (2, "r s")], ["doc_id", "text"]
    )
    rows = cooc_pairs(df, window=1, min_count=3, k=10).collect()
    assert [(r["tok_a"], r["tok_b"]) for r in rows] == [("p", "q")]
    with pytest.raises(ValueError):
        cooc_pairs(df, window=0)


def test_ngram_diversity_hand_computed(spark):
    from transmog_spark.operators.cooc import ngram_diversity

    df = spark.createDataFrame(
        [(1, "a a a a", "rep"), (2, "a b c d", "div")],
        ["doc_id", "text", "source"],
    )
    rows = {
        (r["source"], r["n"]): r
        for r in ngram_diversity(df, max_n=3).collect()
    }
    assert rows[("rep", 1)]["total_grams"] == 4
    assert rows[("rep", 1)]["distinct_grams"] == 1
    assert rows[("rep", 1)]["distinct_ratio"] == 0.25
    assert rows[("rep", 2)]["total_grams"] == 3  # "a a" x3, 1 distinct
    assert rows[("rep", 2)]["distinct_ratio"] == round(1 / 3, 4)
    assert rows[("rep", 3)]["total_grams"] == 2
    for n in (1, 2, 3):
        assert rows[("div", n)]["distinct_ratio"] == 1.0


def test_cooc_pairs_hashed_wire_equals_string_wire(spark):
    from transmog_spark.operators.cooc import cooc_pairs

    df = spark.createDataFrame(
        [(1, "a b a b c a"), (2, "b c b c d"), (3, "x y x y x y")],
        ["doc_id", "text"],
    )
    s = cooc_pairs(df, window=2, min_count=2, k=50).collect()
    h = cooc_pairs(df, window=2, min_count=2, k=50, hashed_wire=True).collect()
    key = lambda r: (r["rank"], r["tok_a"], r["tok_b"], r["c_ab"], r["c_a"], r["c_b"], r["pmi"])
    assert sorted(map(key, s)) == sorted(map(key, h))
    assert len(s) > 2
