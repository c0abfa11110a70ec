"""ANN recall tests (IVF / LSH vs exact brute force) + source-reader tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from transmog_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from transmog_spark.sources.readers import (
    detect_path_format,
    detect_string_format,
    read_data,
    read_file,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_brute_force(emb):
    q = emb.where(F.col("vec_id") < 20)
    exact = _topk_sets(brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5))
    approx = _topk_sets(
        ivf_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5, nlist=8, nprobe=4)
    )
    recalls = [len(exact[k] & approx.get(k, set())) / len(exact[k]) for k in exact]
    assert sum(recalls) / len(recalls) >= 0.6  # probing half the lists


def test_ivf_full_probe_equals_brute_force(emb):
    """nprobe == nlist degenerates to exact search — results must match."""
    q = emb.where(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5))
    full = _topk_sets(
        ivf_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5, nlist=8, nprobe=8)
    )
    assert exact == full


def test_kmeans_refine_deterministic_and_balances(emb):
    """Lloyd refinement is bit-deterministic (exact scaled-integer means)
    and never worsens quantization: the mean round(cos,6) of each point to
    its assigned centroid is non-decreasing vs the raw md5-seed centroids."""
    from transmog_spark.operators.similarity import (
        _centroid_sim_structs,
        kmeans_refine,
    )
    from transmog_spark.functions.hashing import md5_long

    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv"))
    seed_rows = (
        c.orderBy(md5_long(F.col("neighbor_id").cast("string")), "neighbor_id")
        .limit(8)
        .collect()
    )
    seeds = sorted((r["neighbor_id"], [float(x) for x in r["__cv"]]) for r in seed_rows)

    r1 = kmeans_refine(c, seeds, dim=64, iterations=2)
    r2 = kmeans_refine(c, seeds, dim=64, iterations=2)
    assert r1 == r2  # bit-identical across runs (exact integer sums)
    assert [cid for cid, _ in r1] == [cid for cid, _ in seeds]  # stable labels

    def mean_sim(cents):
        sim = F.array_max(_centroid_sim_structs(cents)(F.col("__cv")))["s"]
        return c.agg(F.avg(sim)).collect()[0][0]

    assert mean_sim(r1) >= mean_sim(seeds) - 1e-9  # Lloyd never degrades


def test_ivf_refined_full_probe_equals_brute_force(emb):
    """Refined centroids still partition the corpus: probing every list is
    exact search regardless of where the centroids moved."""
    q = emb.where(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5))
    full = _topk_sets(
        ivf_topk(
            emb, q, id_col="vec_id", vec_col="embedding", k=5, nlist=8, nprobe=8,
            refine_iterations=2, dim=64,
        )
    )
    assert exact == full


def test_lsh_topk_returns_ranked_neighbors(emb):
    q = emb.where(F.col("vec_id") < 10)
    out = lsh_topk(
        emb, q, id_col="vec_id", vec_col="embedding", k=5, n_planes=6, n_probes=3, dim=64
    )
    rows = out.collect()
    assert rows, "LSH with 6 planes + multiprobe should find candidates"
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for ranks in by_q.values():
        ranks.sort()
        cosines = [c for _, c in ranks]
        assert cosines == sorted(cosines, reverse=True)  # rank order = cosine order
        assert ranks[0][0] == 1


def test_sq8_quantization_recall_and_bounds(emb):
    from transmog_spark.operators.similarity import sq8_params, sq8_quantize, sq8_topk

    mins, spans = sq8_params(emb, "embedding", dim=64)
    assert len(mins) == len(spans) == 64 and all(s > 0 for s in spans)
    codes = sq8_quantize(emb, "embedding", mins, spans).select(
        F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
    ).agg(F.min("lo"), F.max("hi")).collect()[0]
    assert codes[0] >= -128 and codes[1] <= 127

    q = emb.where(F.col("vec_id") < 20)
    exact = _topk_sets(brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5))
    approx = _topk_sets(sq8_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5, dim=64))
    recalls = [len(exact[k] & approx.get(k, set())) / len(exact[k]) for k in exact]
    assert sum(recalls) / len(recalls) >= 0.85  # int8 error is tiny at dim 64


# ---------------------------------------------------------------------------
# sources/readers (reference S1-S8)
# ---------------------------------------------------------------------------

def test_detect_string_format():
    assert detect_string_format('{"a": 1}') == "json"
    assert detect_string_format('{"a": 1}\n{"a": 2}\n{"a": 3}') == "jsonl"
    assert detect_string_format("") == "json"
    assert detect_string_format('[{"a": 1}, {"a": 2}]') == "json"


def test_detect_path_format():
    assert detect_path_format("x.jsonl") == "jsonl"
    assert detect_path_format("x.ndjson") == "jsonl"
    assert detect_path_format("x.json") == "json"
    assert detect_path_format("x.parquet") == "parquet"
    assert detect_path_format("x.unknown") == "json"


def test_read_json_file_multiline(spark, tmp_path):
    p = tmp_path / "data.json"
    p.write_text(json.dumps([{"a": 1, "b": {"c": "x"}}, {"a": 2, "b": {"c": "y"}}]))
    df = read_file(spark, str(p))
    assert df.count() == 2
    assert df.select("b.c").collect()[0][0] in ("x", "y")


def test_read_jsonl_file(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"a": 1}\n\n{"a": 2}\n{"a": 3}\n')
    df = read_file(spark, str(p))
    assert df.count() == 3


def test_read_data_string_json_and_jsonl(spark):
    assert read_data(spark, '{"a": 1}').count() == 1
    assert read_data(spark, '[{"a": 1}, {"a": 2}]').count() == 2
    assert read_data(spark, '{"a": 1}\n{"a": 2}').count() == 2


def test_read_csv_file(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_file(spark, str(p))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_read_json5_file(spark, tmp_path):
    # parses with or without the optional json5 package (vendored fallback)
    p = tmp_path / "d.json5"
    p.write_text(
        "// config\n[\n  {a: 1, b: 'x', c: .5,},\n  {a: 0x10, b: \"y\", c: +2.,},\n]"
    )
    rows = {tuple(r) for r in read_file(spark, str(p)).select("a", "b", "c").collect()}
    assert rows == {(1, "x", 0.5), (16, "y", 2.0)}


def test_read_hjson_file(spark, tmp_path):
    p = tmp_path / "d.hjson"
    p.write_text("{\n  # comment\n  name: hello world\n  count: 3\n  ok: true\n}")
    r = read_file(spark, str(p)).collect()[0]
    assert (r["name"], r["count"], r["ok"]) == ("hello world", 3, True)
