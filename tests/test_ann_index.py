"""Persisted incremental ANN index: one-shot ≡ ivf_topk, increments ≡
rebuild against the frozen centroids, streamed ≡ batch."""

from __future__ import annotations

import glob
import json
import os
import shutil


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_indexed_search_equals_ivf_topk(spark, sf_dir, tmp_path):
    from transmog_spark.operators.ann_index import ann_index, ann_topk_indexed
    from transmog_spark.operators.similarity import ivf_topk

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = e.where("vec_id < 6")
    idx = ann_index(e, str(tmp_path / "idx"), nlist=8)
    got = ann_topk_indexed(spark, idx, q, k=5, nprobe=3)
    want = ivf_topk(e, q, k=5, nlist=8, nprobe=3)
    assert _rows(got) == _rows(want) and got.columns == want.columns


def test_incremental_update_equals_rebuild(spark, sf_dir, tmp_path):
    from transmog_spark.operators.ann_index import (
        ann_index,
        ann_index_update,
        ann_topk_indexed,
        index_centroids,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    half1, half2 = e.where("vec_id % 2 = 0"), e.where("vec_id % 2 = 1")
    q = e.where("vec_id < 6")

    incr = ann_index(half1, str(tmp_path / "incr"), nlist=8)
    cents = index_centroids(incr)
    ann_index_update(spark, half2, incr)

    # rebuild the union against the SAME frozen centroids
    full = ann_index(e, str(tmp_path / "full"), centroids=cents)
    a = ann_topk_indexed(spark, incr, q, k=5, nprobe=3)
    b = ann_topk_indexed(spark, full, q, k=5, nprobe=3)
    assert _rows(a) == _rows(b) and a.count() > 0

    # centroids did not move; counters did
    assert index_centroids(incr) == cents
    with open(os.path.join(incr, "_ann_index_meta.json")) as fh:
        assert json.load(fh)["n_vecs"] == e.count()


def test_update_appends_only(spark, sf_dir, tmp_path):
    """Delta folding must not rewrite existing vector files (cost ∝ delta)."""
    from transmog_spark.operators.ann_index import ann_index, ann_index_update

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = ann_index(e.where("vec_id < 400"), str(tmp_path / "idx"), nlist=8)
    before = set(glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")))
    ann_index_update(spark, e.where("vec_id >= 400"), idx)
    after = set(glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")))
    assert before <= after and len(after) > len(before)


def test_streamed_index_equals_batch(spark, sf_dir, tmp_path):
    from transmog_spark.operators.ann_index import (
        ann_index,
        ann_topk_indexed,
        index_centroids,
    )
    from transmog_spark.streaming.ann import ann_index_foreach_batch

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    src = tmp_path / "src"
    src.mkdir()
    for i, pred in enumerate(["vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2"]):
        stage = str(tmp_path / f"stage{i}")
        e.where(pred).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, src / f"b{i}.parquet")

    idx = str(tmp_path / "stream_idx")
    q = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(ann_index_foreach_batch(idx, nlist=8))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    cents = index_centroids(idx)
    full = ann_index(e, str(tmp_path / "full"), centroids=cents)
    queries = e.where("vec_id < 6")
    a = ann_topk_indexed(spark, idx, queries, k=5, nprobe=3)
    b = ann_topk_indexed(spark, full, queries, k=5, nprobe=3)
    assert _rows(a) == _rows(b) and a.count() > 0

    with open(os.path.join(idx, "_ann_index_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_vecs"] == e.count()

    # committed-batch replay after restart is an exact no-op
    handler = ann_index_foreach_batch(idx, nlist=8)
    handler(e.where("vec_id % 3 = 2"), meta["last_batch_id"])
    with open(os.path.join(idx, "_ann_index_meta.json")) as fh:
        assert json.load(fh)["n_vecs"] == e.count()
    assert _rows(ann_topk_indexed(spark, idx, queries, k=5, nprobe=3)) == _rows(a)
