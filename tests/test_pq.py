"""Product quantization: codebook training, ADC ranking, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.similarity import ivfpq_topk, pq_topk, pq_train

DIM, M, KSUB = 8, 2, 8


def _clustered(spark, n=120, n_centers=4, spread=0.05):
    # vec = center[id % n_centers] + small deterministic offset
    cid = F.col("id") % n_centers
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                (F.xxhash64(F.lit("c"), cid, j) % 1000).cast("double") / 1000.0
                + spread * (F.xxhash64(F.col("id"), j) % 1000).cast("double") / 1000.0
            ),
        ).alias("embedding"),
    )


def test_pq_recovers_cluster_neighbors(spark):
    c = _clustered(spark)
    q = c.where(F.col("vec_id") < 4)  # one query per center
    got = pq_topk(
        c, q, k=5, dim=DIM, m=M, ksub=KSUB, refine_iterations=2
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        assert len(rows) == 5
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
        # every retrieved neighbor comes from the query's own cluster
        assert all(r["neighbor_id"] % 4 == qid % 4 for r in rows), rows
        assert all(r["neighbor_id"] != qid for r in rows)


def test_pq_trained_books_shape_and_reuse(spark):
    c = _clustered(spark)
    books = pq_train(c, dim=DIM, m=M, ksub=KSUB, refine_iterations=1)
    assert len(books) == M
    assert all(len(b) == KSUB for b in books)
    assert all(len(cv) == DIM // M for b in books for cv in b)
    q = c.where(F.col("vec_id") < 2)
    inline = pq_topk(c, q, k=3, dim=DIM, m=M, ksub=KSUB, refine_iterations=1)
    reused = pq_topk(c, q, k=3, dim=DIM, m=M, ksub=KSUB, books=books)
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, reused.collect()))


def test_pq_deterministic_across_partitionings(spark):
    c1 = _clustered(spark).repartition(1)
    c16 = _clustered(spark).repartition(16)
    q = _clustered(spark).where(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq_topk(c1, q, k=4, dim=DIM, m=M, ksub=KSUB).collect()))
    b = sorted(map(tuple, pq_topk(c16, q, k=4, dim=DIM, m=M, ksub=KSUB).collect()))
    assert a == b


def test_ivfpq_recovers_cluster_neighbors(spark):
    c = _clustered(spark)
    q = c.where(F.col("vec_id") < 4)
    got = ivfpq_topk(
        c, q, k=5, dim=DIM, nlist=4, nprobe=2, m=M, ksub=KSUB,
        pq_refine_iterations=2,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        assert len(rows) == 5
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
        assert all(r["neighbor_id"] % 4 == qid % 4 for r in rows), rows
        assert all(r["neighbor_id"] != qid for r in rows)


def test_ivfpq_pretrained_model_reuse_identical(spark):
    from transmog_spark.operators.similarity import ivfpq_encode, ivfpq_train

    c = _clustered(spark)
    q = c.where(F.col("vec_id") < 2)
    kw = dict(k=3, dim=DIM, nlist=4, nprobe=2, m=M, ksub=KSUB)
    model = ivfpq_train(c, dim=DIM, nlist=4, m=M, ksub=KSUB)
    inline = ivfpq_topk(c, q, **kw)
    reused = ivfpq_topk(c, q, model=model, **kw)
    enc = ivfpq_encode(c, model, dim=DIM)
    from_index = ivfpq_topk(c, q, model=model, encoded=enc, **kw)
    a = sorted(map(tuple, inline.collect()))
    assert a == sorted(map(tuple, reused.collect()))
    assert a == sorted(map(tuple, from_index.collect()))


def test_ivfpq_deterministic_across_partitionings(spark):
    c1 = _clustered(spark).repartition(1)
    c16 = _clustered(spark).repartition(16)
    q = _clustered(spark).where(F.col("vec_id") < 3)
    kw = dict(k=4, dim=DIM, nlist=4, nprobe=2, m=M, ksub=KSUB)
    a = sorted(map(tuple, ivfpq_topk(c1, q, **kw).collect()))
    b = sorted(map(tuple, ivfpq_topk(c16, q, **kw).collect()))
    assert a == b


def test_ivfpq_residual_adc_beats_probe_floor(spark):
    # every probed-list candidate appears at most once (a vector lives in
    # exactly one inverted list, probes are distinct), and self is excluded
    c = _clustered(spark)
    q = c.where(F.col("vec_id") < 4)
    got = ivfpq_topk(
        c, q, k=50, dim=DIM, nlist=4, nprobe=1, m=M, ksub=KSUB
    ).collect()
    seen = set()
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert key not in seen
        assert r["query_id"] != r["neighbor_id"]
        seen.add(key)


def test_pq_rejects_indivisible_dim(spark):
    c = _clustered(spark)
    import pytest

    with pytest.raises(ValueError):
        pq_topk(c, c.limit(1), k=1, dim=DIM, m=3)


def test_rerank_recovers_brute_force_exact(spark):
    """rerank over ANY candidate superset of the true top-k returns exactly
    the brute-force result (same neighbors, same ranks, same schema)."""
    from transmog_spark.operators.similarity import brute_force_topk, rerank_topk

    c = _clustered(spark)
    q = c.where(F.col("vec_id") < 4)
    exact = brute_force_topk(c, q, k=5)
    cand = brute_force_topk(c, q, k=30)
    got = rerank_topk(c, q, cand, k=5)
    assert got.columns == exact.columns
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exact.collect()))


def test_rerank_lifts_ivfpq_recall(spark):
    """The FAISS IndexRefineFlat posture: ivfpq(top-R) -> exact rerank
    recovers brute-force top-5 that raw ADC ranking misses."""
    from transmog_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
        rerank_topk,
    )

    c = _clustered(spark)
    q = c.where(F.col("vec_id") < 4)
    kw = dict(dim=DIM, nlist=4, nprobe=2, m=M, ksub=KSUB)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(c, q, k=5).collect()
    }
    cand = ivfpq_topk(c, q, k=30, **kw)
    rer = {
        (r["query_id"], r["neighbor_id"])
        for r in rerank_topk(c, q, cand, k=5).collect()
    }
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(c, q, k=5, **kw).collect()
    }
    assert len(rer & exact) >= len(raw & exact)
    assert len(rer & exact) / len(exact) >= 0.9


def test_rerank_l2_metric_matches_exact_l2(spark):
    """metric='l2' reranks in the PQ tiers' own metric: candidates from any
    superset recover the exact L2 top-k (dist2 ascending)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from ann_bench import brute_force_l2

    from transmog_spark.operators.similarity import brute_force_topk, rerank_topk

    c = _clustered(spark)
    q = c.where(F.col("vec_id") < 3)
    exact = brute_force_l2(c, q, k=4)
    cand = brute_force_topk(c, q, k=30)  # any superset candidate source
    got = rerank_topk(c, q, cand, k=4, metric="l2")
    assert got.columns == ["query_id", "neighbor_id", "dist2", "rank"]
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exact.collect()))
