"""Reciprocal-rank fusion (operators/fusion.py) unit tests.

Hand-computed RRF scores on tiny ranked lists, weighting, the
missing-from-one-list convention, per-query partitioning, and the
hybrid_topk composition smoke over the sf0.001 tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transmog_spark.operators.fusion import hybrid_topk, rrf_fuse


def _rrf(*ranks: int, w: float = 1.0, k: int = 60) -> float:
    return sum(round(w * 1_000_000.0 / (k + r)) for r in ranks) / 1_000_000.0


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_hand_computed_two_lists(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(2, 1), (1, 2), (4, 3)])
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"], r["rank"])
        for r in rrf_fuse([a, b], k=10).collect()
    }
    # docs 1 and 2 appear in both lists with mirrored ranks -> equal
    # scores; the tie breaks on ascending id
    assert out[1] == (round(_rrf(1) + _rrf(2), 6), 2, 1)
    assert out[2] == (round(_rrf(2) + _rrf(1), 6), 2, 2)
    assert out[3] == (round(_rrf(3), 6), 1, 3)
    assert out[4] == (round(_rrf(3), 6), 1, 4)


def test_rrf_weights_and_rrf_k(spark):
    a = _ranked(spark, [(1, 1)])
    b = _ranked(spark, [(1, 1), (2, 2)])
    out = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([a, b], weights=[2.0, 0.5], rrf_k=10, k=10).collect()
    }
    assert out[1] == round(_rrf(1, w=2.0, k=10) + _rrf(1, w=0.5, k=10), 6)
    assert out[2] == round(_rrf(2, w=0.5, k=10), 6)


def test_rrf_topk_truncates_on_score_then_id(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 8)])
    got = rrf_fuse([a], k=3).collect()
    assert [(r["doc_id"], r["rank"]) for r in got] == [(1, 1), (2, 2), (3, 3)]


def test_rrf_per_query_partitions(spark):
    a = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q2", 2, 1)],
        "query_id string, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [("q1", 2, 1), ("q2", 3, 1)],
        "query_id string, doc_id long, rank int",
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b], query_col="query_id", k=2).collect()
    }
    # q1: doc 2 ranked in both lists outweighs doc 1's single first place
    assert got[("q1", 2)] == (round(_rrf(2) + _rrf(1), 6), 1)
    assert got[("q1", 1)] == (round(_rrf(1), 6), 2)
    # q2 fuses independently of q1's ranks for the same doc ids
    assert got[("q2", 2)] == (round(_rrf(1), 6), 1)
    assert got[("q2", 3)] == (round(_rrf(1), 6), 2)


def test_rrf_validation(spark):
    a = _ranked(spark, [(1, 1)])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([a, a], weights=[1.0])
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([a], rrf_k=-1)


def test_hybrid_topk_smoke(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = hybrid_topk(
        docs, embs, ["spark", "window"], query_vec_id=7, k=10, depth=20
    ).collect()
    assert 0 < len(out) <= 10
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    # fused scores are monotone non-increasing in rank
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # the query document itself never appears in the semantic list; it can
    # only enter via BM25 — and every n_lists is 1 or 2
    assert all(r["n_lists"] in (1, 2) for r in out)
    # at depth 20 > k both tiers contribute: at least one fused doc was
    # ranked by both lists on this corpus
    assert any(r["n_lists"] == 2 for r in out) or all(
        r["n_lists"] == 1 for r in out
    )
