"""Feature hashing (Weinberger et al. 2009): vector properties, exact
nearest-neighbor semantics, and HLL-style cross-engine determinism are
covered by the oracle row; here pin the algebraic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),          # exact dup of 1
        (3, "alpha beta gamma delta DIFFERENT words"),  # near dup
        (4, "completely unrelated vocabulary here now"),
        (5, "zeta eta theta iota kappa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_features_bounded_and_deterministic(spark):
    from transmog_spark.operators.hashfeat import hash_features

    f1 = hash_features(_docs(spark), dim=32, seed=1)
    rows = f1.collect()
    assert all(0 <= r["bucket"] < 32 for r in rows)
    assert all(r["w"] != 0 for r in rows)
    # per-doc sparsity bounded by dim
    per = f1.groupBy("id").count().collect()
    assert all(r["count"] <= 32 for r in per)
    # identical text -> identical vector (pure function of tokens)
    v1 = {(r["bucket"], r["w"]) for r in rows if r["id"] == 1}
    v2 = {(r["bucket"], r["w"]) for r in rows if r["id"] == 2}
    assert v1 == v2 and len(v1) > 0


def test_hashed_cosine_topk_ranks_duplicates_first(spark):
    from transmog_spark.operators.hashfeat import hashed_cosine_topk

    top = hashed_cosine_topk(
        _docs(spark), dim=64, seed=1, query_filter="doc_id = 1", k=4
    ).collect()
    by_rank = {r["rank"]: r for r in top}
    # the exact duplicate is rank 1 with cosine 1.0
    assert by_rank[1]["id"] == 2 and by_rank[1]["cos"] == 1.0
    # the near dup outranks the disjoint-vocabulary docs
    assert by_rank[2]["id"] == 3
    # no self matches
    assert all(r["id"] != 1 for r in top)
    # cosine is monotonically non-increasing in rank
    coss = [by_rank[i]["cos"] for i in sorted(by_rank)]
    assert coss == sorted(coss, reverse=True)


def test_hashed_topk_plan_broadcasts_query_side(spark, sf_dir):
    """The corpus feature pass must never hash-partition on the corpus
    id for the scoring join — the query side (filter-bounded) broadcasts."""
    import os

    from transmog_spark.operators.hashfeat import hashed_cosine_topk

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    df = hashed_cosine_topk(docs, dim=64, seed=1, query_filter="doc_id < 5", k=5)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_centroid_classify_recovers_domains(spark):
    """Two domains with disjoint vocabulary: every doc — including ones
    outside the training half — lands on its own domain's centroid."""
    from transmog_spark.operators.hashfeat import centroid_classify

    sports = "goal match team score win league player season".split()
    cooking = "recipe bake flour oven simmer garlic butter salt".split()
    rows = []
    for i in range(20):
        words = [sports[(i + j) % 8] for j in range(6)]
        rows.append((i, " ".join(words), "sports"))
    for i in range(20, 40):
        words = [cooking[(i + j) % 8] for j in range(6)]
        rows.append((i, " ".join(words), "cooking"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = centroid_classify(
        df, dim=64, seed=1, labeled_filter="doc_id % 2 = 0"
    ).collect()
    assert len(got) == 40
    acc = sum(1 for r in got if r["label"] == r["true_label"]) / 40
    assert acc == 1.0
    assert all(r["cos"] > 0 for r in got)
