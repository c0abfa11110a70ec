"""Streaming BM25 index maintenance: stream N batches ≡ full rebuild."""

from __future__ import annotations

import glob
import json
import os
import shutil


def _stage_batches(spark, tmp_path, batches, schema):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, src / f"b{i}.parquet")
    return str(src)


def test_streamed_index_equals_full_rebuild(spark, tmp_path):
    from transmog_spark.operators.corpus import bm25_index, bm25_topk_indexed
    from transmog_spark.streaming.bm25 import bm25_index_foreach_batch

    batches = [
        [(1, "apple banana apple cherry"), (2, "banana cherry date")],
        [(3, "apple date elderberry fig"), (4, "cherry cherry date grape")],
        [(5, "apple banana cherry date elderberry fig grape")],
    ]
    schema = "doc_id long, text string"
    src = _stage_batches(spark, tmp_path, batches, schema)

    idx = str(tmp_path / "stream_idx")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            bm25_index_foreach_batch(idx, term_buckets=8)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    full = str(tmp_path / "full_idx")
    union = spark.createDataFrame([r for b in batches for r in b], schema)
    bm25_index(union, full, term_buckets=8)

    terms = ["apple", "cherry", "elderberry", "grape"]
    a = sorted(map(tuple, bm25_topk_indexed(spark, idx, terms, k=5).collect()))
    b = sorted(map(tuple, bm25_topk_indexed(spark, full, terms, k=5).collect()))
    assert a == b and len(a) == 5

    with open(os.path.join(idx, "_bm25_index_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_docs"] == 5
    assert meta["last_batch_id"] == 2

    # replay of a committed batch (restart semantics) is an exact no-op
    handler = bm25_index_foreach_batch(idx, term_buckets=8)
    handler(spark.createDataFrame(batches[2], schema), 2)
    with open(os.path.join(idx, "_bm25_index_meta.json")) as fh:
        meta2 = json.load(fh)
    assert meta2["n_docs"] == 5  # not double-counted
    again = sorted(map(tuple, bm25_topk_indexed(spark, idx, terms, k=5).collect()))
    assert again == a
