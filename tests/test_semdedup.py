"""SemDeDup: keep-rule correctness on planted duplicate groups."""

from __future__ import annotations

from transmog_spark.operators.similarity import semdedup

# dim-4 corpus: a near-identical pair (0, 1), a mutually-similar triple
# (10, 11, 12), and isolated vectors nowhere near anything else
VECS = {
    0: [1.0, 0.0, 0.0, 0.0],
    1: [0.999, 0.02, 0.0, 0.0],
    10: [0.0, 1.0, 0.0, 0.0],
    11: [0.0, 0.999, 0.03, 0.0],
    12: [0.0, 0.995, 0.0, 0.05],
    20: [0.0, 0.0, 1.0, 0.0],
    21: [0.0, 0.0, 0.0, 1.0],
    22: [0.5, -0.5, 0.5, -0.5],
    23: [-0.5, 0.5, 0.5, -0.5],
    24: [-0.5, -0.5, 0.5, 0.5],
}


def _run(spark, **kw):
    df = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    kw.setdefault("dim", 4)
    kw.setdefault("nlist", 4)
    kw.setdefault("threshold", 0.98)
    rows = semdedup(df, **kw).collect()
    return {r["vec_id"]: r for r in rows}


def test_semdedup_verdicts(spark):
    got = _run(spark)
    # one row per input, keep is 0/1
    assert len(got) == len(VECS)
    assert all(r["keep"] in (0, 1) for r in got.values())
    # isolated vectors always survive
    for i in (20, 21, 22, 23, 24):
        assert got[i]["keep"] == 1, i
    # the near-identical pair loses exactly one member: the one closer to
    # the centroid (SemDeDup keep rule), ids breaking ties
    pair = [got[0], got[1]]
    assert sorted(r["keep"] for r in pair) == [0, 1]
    kept = next(r for r in pair if r["keep"] == 1)
    dropped = next(r for r in pair if r["keep"] == 0)
    assert (kept["cent_sim"], kept["vec_id"]) < (dropped["cent_sim"], dropped["vec_id"])
    # the mutually-similar triple keeps at least its lowest-cent_sim member
    # and drops at least one
    triple = [got[10], got[11], got[12]]
    keeps = [r["keep"] for r in triple]
    assert 1 <= sum(keeps) <= 2
    lowest = min(triple, key=lambda r: (r["cent_sim"], r["vec_id"]))
    assert lowest["keep"] == 1


def test_semdedup_threshold_1_keeps_everything(spark):
    # only bit-identical vectors can reach cosine 1.0 — nothing here does
    got = _run(spark, threshold=1.0)
    assert all(r["keep"] == 1 for r in got.values())


def test_semdedup_refinement_same_contract(spark):
    got = _run(spark, refine_iterations=2)
    assert len(got) == len(VECS)
    # the planted pair still collapses to one survivor after k-means moves
    # the centroids
    assert sorted([got[0]["keep"], got[1]["keep"]]) == [0, 1]


def test_embedding_group_stats_drift_direction(spark):
    from transmog_spark.operators.similarity import embedding_group_stats

    # group A hugs +x, group B hugs +y: both drift equally from the global
    # centroid; a third group ON the global direction drifts least
    rows = []
    for i in range(8):
        rows.append((i, [1.0, 0.01 * i, 0.0], "A"))
        rows.append((100 + i, [0.01 * i, 1.0, 0.0], "B"))
        rows.append((200 + i, [1.0, 1.0, 0.0], "C"))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r.label: r for r in embedding_group_stats(df, "embedding", "label").collect()}
    assert out["A"].n_vecs == 8 and out["B"].n_vecs == 8
    assert abs(out["A"].drift - out["B"].drift) < 1e-3  # symmetric
    assert out["C"].drift < out["A"].drift              # on-axis group
    for r in out.values():
        assert abs((1 - r.cos_to_global) - r.drift) < 1e-9


def test_embedding_outliers_flags_planted_vector(spark):
    from transmog_spark.operators.similarity import embedding_outliers

    # 19 tightly-clustered vectors + one orthogonal: the plant must flag,
    # cluster members must not
    rows = [(i, [1.0, 0.001 * (i % 5), 0.0], "g") for i in range(19)]
    rows.append((99, [0.0, 0.0, 1.0], "g"))
    rows.append((500, [0.5, 0.5, 0.5], "solo"))  # n=1 group: NULL z
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r.vec_id: r for r in embedding_outliers(df, "vec_id", "embedding", "label").collect()}
    assert out[99].is_outlier and out[99].z < -2
    assert not any(out[i].is_outlier for i in range(19))
    assert out[500].z is None and not out[500].is_outlier
    # cosine to own centroid is on the round-6 grid and within [-1, 1]
    for r in out.values():
        assert -1.0 <= r.cos_centroid <= 1.0


def test_jl_project_distance_preservation_and_exactness(spark):
    import math
    import random

    from transmog_spark.operators.similarity import jl_project

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r.proj for r in jl_project(
        df, "vec_id", "embedding", dim=64, out_dim=32, seed="t"
    ).collect()}
    # determinism + seed sensitivity
    out2 = {r.vec_id: r.proj for r in jl_project(
        df, "vec_id", "embedding", dim=64, out_dim=32, seed="t"
    ).collect()}
    outb = {r.vec_id: r.proj for r in jl_project(
        df, "vec_id", "embedding", dim=64, out_dim=32, seed="u"
    ).collect()}
    assert out == out2 and out != outb
    # JL property: pairwise L2 distances preserved in expectation after
    # the 1/sqrt(out_dim) normalization (loose band — random matrix)
    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    for a in range(0, 10):
        for b in range(a + 1, 10):
            orig = d(rows[a][1], rows[b][1])
            proj = d(out[a], out[b]) / (1_000_000 * math.sqrt(32))
            ratios.append(proj / orig)
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
    import pytest

    with pytest.raises(ValueError):
        jl_project(df, dim=0, out_dim=4)


def test_jl_rerank_stack_composes(spark):
    from pyspark.sql import functions as F

    from transmog_spark.operators.similarity import (
        brute_force_topk,
        jl_project,
        rerank_topk,
    )

    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    proj = jl_project(df, "vec_id", "embedding", dim=16, out_dim=8, seed="t")
    cand = brute_force_topk(
        proj, proj.where(F.col("vec_id") < 5), id_col="vec_id", vec_col="proj", k=15
    )
    out = rerank_topk(
        df, df.where(F.col("vec_id") < 5), cand, id_col="vec_id", vec_col="embedding", k=3
    )
    rows_out = out.collect()
    assert {r.query_id for r in rows_out} == set(range(5))
    for r in rows_out:
        assert 1 <= r.rank <= 3 and r.neighbor_id != r.query_id


def test_cosine_spectrum_buckets_and_structure(spark):
    import pytest

    from transmog_spark.operators.similarity import cosine_spectrum

    # two tight clusters along +x and +y: stride-1 pairs alternate between
    # same-cluster (cos ~1) and cross-cluster (cos ~0) -> bimodal spectrum
    rows = []
    for i in range(40):
        v = [1.0, 0.001 * (i % 3), 0.0] if i % 2 == 0 else [0.001 * (i % 3), 1.0, 0.0]
        rows.append((i, v))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_spectrum(df, strides=(1, 2), bucket_width=0.5).collect()
    hist = {}
    for r in out:
        hist[(r.stride, r.bucket_lo)] = r.n_pairs
    # stride 1 = always cross-cluster (near 0); stride 2 = same cluster (~1)
    assert hist[(1, 0.0)] == 39
    # cos == 1.0 rounds into the bucket starting at 1.0
    assert hist[(2, 1.0)] + hist.get((2, 0.5), 0) == 38
    assert (2, 0.0) not in hist
    # pair counts: n - stride per stride
    assert sum(n for (s, _), n in hist.items() if s == 1) == 39
    assert sum(n for (s, _), n in hist.items() if s == 2) == 38
    with pytest.raises(ValueError):
        cosine_spectrum(df, bucket_width=0)
