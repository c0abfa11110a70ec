"""MMR-diversified top-k: diversity behavior, degenerate λ, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.similarity import brute_force_topk, mmr_topk


def _toy(spark):
    # query points along x; A1/A2 near-identical high-relevance pair, B a
    # moderately relevant but diverse third direction
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.14, 0.0, 0.0]),  # A1: rel ~0.990
            (2, [0.99, 0.141, 0.0, 0.0]),  # A2: ~A1 (sim ~1.0)
            (3, [0.70, 0.0, 0.71, 0.0]),  # B:  rel ~0.702, sim(A,B) ~0.70
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    return corpus, queries


def test_mmr_prefers_diverse_over_near_duplicate(spark):
    """After picking A1, the near-duplicate A2 is penalized by its ~1.0
    similarity to the selected set, so the diverse B wins rank 2 — the
    whole point of the operator; plain relevance rank would return A1, A2."""
    corpus, queries = _toy(spark)
    got = {
        r["rank"]: r["neighbor_id"]
        for r in mmr_topk(corpus, queries, k=2, fetch_r=3, lam=0.5).collect()
    }
    assert got == {1: 1, 2: 3}


def test_mmr_lambda_one_is_relevance_rank(spark):
    """λ=1 zeroes the diversity term: the selection order must equal the
    relevance order, near-duplicates and all."""
    corpus, queries = _toy(spark)
    got = {
        r["rank"]: r["neighbor_id"]
        for r in mmr_topk(corpus, queries, k=2, fetch_r=3, lam=1.0).collect()
    }
    assert got == {1: 1, 2: 2}


def test_mmr_explicit_candidates_match_default(spark):
    """Composability: feeding the default tier's candidate frame explicitly
    (the rerank_topk calling convention) reproduces the default output."""
    corpus, queries = _toy(spark)
    cand = brute_force_topk(corpus, queries, k=3)
    via_default = mmr_topk(corpus, queries, k=2, fetch_r=3, lam=0.5).collect()
    via_explicit = mmr_topk(
        corpus, queries, k=2, lam=0.5, candidates=cand
    ).collect()
    assert sorted(map(tuple, via_default)) == sorted(map(tuple, via_explicit))


def test_diverse_sample_lambda_one_is_centrality_rank(spark):
    """λ=1 zeroes the diversity term, so per-cluster picks must be exactly
    the top-per_cell members by (cent_sim DESC, id ASC) of the same
    assignment frame — an oracle-independent equivalence."""
    from tests.test_pq import DIM, _clustered
    from transmog_spark.operators.similarity import diverse_sample, semdedup_assign

    c = _clustered(spark)
    assigned = semdedup_assign(c, dim=DIM, nlist=4)
    got = diverse_sample(c, dim=DIM, nlist=4, per_cell=3, lam=1.0, assigned=assigned)
    by_cell: dict = {}
    for r in got.collect():
        by_cell.setdefault(r["cluster_id"], []).append((r["rank"], r["vec_id"]))
    expect: dict = {}
    for r in assigned.collect():
        expect.setdefault(r["cluster_id"], []).append(
            (-round(r["cent_sim"], 6), r["vec_id"])
        )
    assert by_cell
    for cell, rows in by_cell.items():
        want = [vid for _, vid in sorted(expect[cell])[:3]]
        assert [vid for _, vid in sorted(rows)] == want


def test_diverse_sample_structure_and_membership(spark):
    """per_cell ranked picks per cluster, unique ids, and every pick is a
    member of its own cluster in the assignment."""
    from tests.test_pq import DIM, _clustered
    from transmog_spark.operators.similarity import diverse_sample, semdedup_assign

    c = _clustered(spark)
    assigned = semdedup_assign(c, dim=DIM, nlist=4)
    member = {
        (r["cluster_id"], r["vec_id"]) for r in assigned.collect()
    }
    rows = diverse_sample(
        c, dim=DIM, nlist=4, per_cell=5, lam=0.5, assigned=assigned
    ).collect()
    by_cell: dict = {}
    for r in rows:
        assert (r["cluster_id"], r["vec_id"]) in member
        by_cell.setdefault(r["cluster_id"], []).append(r)
    all_ids = [r["vec_id"] for r in rows]
    assert len(all_ids) == len(set(all_ids))  # a doc is picked at most once
    for cell, cell_rows in by_cell.items():
        assert sorted(r["rank"] for r in cell_rows) == list(
            range(1, len(cell_rows) + 1)
        )
        assert len(cell_rows) <= 5


def test_diverse_sample_deterministic_across_partitionings(spark):
    from tests.test_pq import DIM, _clustered
    from transmog_spark.operators.similarity import diverse_sample

    out = [
        sorted(
            map(
                tuple,
                diverse_sample(
                    _clustered(spark).repartition(n),
                    dim=DIM,
                    nlist=4,
                    per_cell=4,
                    lam=0.3,
                ).collect(),
            )
        )
        for n in (1, 16)
    ]
    assert out[0] == out[1]


def test_mmr_deterministic_across_partitionings(spark):
    from tests.test_pq import _clustered

    q = _clustered(spark).where(F.col("vec_id") < 3)
    out = [
        sorted(
            map(
                tuple,
                mmr_topk(
                    _clustered(spark).repartition(n), q, k=5, fetch_r=12, lam=0.7
                ).collect(),
            )
        )
        for n in (1, 16)
    ]
    assert out[0] == out[1]
    # 5 full ranks per query, no repeats within a query
    per_q: dict = {}
    for query_id, neighbor_id, _mmr, rank in out[0]:
        per_q.setdefault(query_id, []).append((rank, neighbor_id))
    for query_id, rows in per_q.items():
        assert sorted(r for r, _ in rows) == [1, 2, 3, 4, 5]
        assert len({n for _, n in rows}) == 5


def test_retrieval_metrics_hand_computed(spark):
    import math

    from transmog_spark.operators.similarity import retrieval_metrics

    # ground truth: q1 -> {10, 11, 12}; approx ranks: 10@1, 12@3, 99@2
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)], ["query_id", "neighbor_id"]
    )
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 12, 3), (2, 77, 1)],
        ["query_id", "neighbor_id", "rank"],
    )
    out = {r.query_id: r for r in retrieval_metrics(approx, exact, k=5).collect()}
    w = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 6)]
    r1 = out[1]
    assert r1.n_exact == 3 and r1.n_hit == 2
    assert r1.mrr == 1.0  # best relevant at rank 1
    assert abs(r1.ndcg - round((w[0] + w[2]) / (w[0] + w[1] + w[2]), 4)) < 1e-9
    # q2: zero relevant retrieved -> both metrics exactly 0 (NULL-index
    # guard: without it, Spark's element_at(arr, NULL) = LAST element)
    r2 = out[2]
    assert r2.n_hit == 0 and r2.mrr == 0.0 and r2.ndcg == 0.0


def test_retrieval_metrics_best_rank_and_cutoff(spark):
    from transmog_spark.operators.similarity import retrieval_metrics

    exact = spark.createDataFrame([(1, 10)], ["query_id", "neighbor_id"])
    # duplicate candidate rows keep the BEST rank; ranks beyond k ignored
    approx = spark.createDataFrame(
        [(1, 10, 4), (1, 10, 2), (1, 55, 1)], ["query_id", "neighbor_id", "rank"]
    )
    r = retrieval_metrics(approx, exact, k=3).collect()[0]
    assert r.mrr == 0.5  # min rank 2
    r = retrieval_metrics(approx, exact, k=1).collect()[0]
    assert r.mrr == 0.0 and r.ndcg == 0.0  # both ranks past the cutoff
    import pytest

    with pytest.raises(ValueError):
        retrieval_metrics(approx, exact, k=0)
