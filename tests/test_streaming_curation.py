"""Streaming e2e curation: batch ≡ stream parity on real availableNow runs.

The parity contract of streaming/curation.py: each micro-batch's output
equals the batch chain applied to that batch's rows (per-file groups under
maxFilesPerTrigger=1), and a single-batch run equals the batch chain on
the whole input. Model + benchmark are static frames shared by both
sides, so any divergence would be a real engine bug, not model drift.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from transmog_spark.streaming.curation import curate_batch, curation_foreach_batch
from transmog_spark.streaming.quality import train_reference_model


def _setup(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    ref = docs.where(F.col("doc_id") % 3 == 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    incoming = docs.where((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 97 != 0))
    model = train_reference_model(ref)
    bench = bench.persist()
    return incoming, model, bench


def _run_stream(spark, schema, src, chk, model, bench, max_files=None):
    got: dict = {}

    def sink(kept, batch_id):
        for r in kept.collect():
            assert r["doc_id"] not in got, "doc crossed batches"
            got[r["doc_id"]] = (r["source"], r["n_tok"])

    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    q = (
        reader.parquet(src)
        .writeStream.foreachBatch(
            curation_foreach_batch(sink, lm_model=model, benchmark=bench)
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return got


def test_single_batch_stream_equals_batch_chain(spark, sf_dir, tmp_path):
    incoming, model, bench = _setup(spark, sf_dir)
    expected = {
        r["doc_id"]: (r["source"], r["n_tok"])
        for r in curate_batch(incoming, lm_model=model, benchmark=bench).collect()
    }
    src = str(tmp_path / "src1")
    incoming.coalesce(1).write.parquet(src)
    got = _run_stream(
        spark, incoming.schema, src, str(tmp_path / "chk1"), model, bench
    )
    assert got == expected
    assert len(got) > 0


def test_multi_batch_stream_equals_per_file_batch_chain(spark, sf_dir, tmp_path):
    incoming, model, bench = _setup(spark, sf_dir)
    src = str(tmp_path / "src2")
    # two explicit files -> two micro-batches under maxFilesPerTrigger=1
    incoming.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    incoming.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    assert len(files) == 2

    expected: dict = {}
    for f in files:
        part = spark.read.parquet(f)
        for r in curate_batch(part, lm_model=model, benchmark=bench).collect():
            expected[r["doc_id"]] = (r["source"], r["n_tok"])

    got = _run_stream(
        spark, incoming.schema, src, str(tmp_path / "chk2"), model, bench,
        max_files=1,
    )
    assert got == expected
    assert len(got) > 0


def test_short_docs_survive_when_gate_keeps_them(spark):
    """A doc with fewer than decontaminate_n tokens emits zero n-grams and
    is absent from the decontaminate frame — it must PASS the contamination
    filter (left join + coalesce 0), not silently vanish (reachable when
    gate_thresholds set min_tokens below decontaminate_n)."""
    from transmog_spark.streaming.quality import train_reference_model

    docs = spark.createDataFrame(
        [
            (1, "the of and", "web"),  # 3 tokens < decontaminate_n=5
            (2, "the cat and the dog sat on the mat of the house in it", "web"),
        ],
        "doc_id long, text string, source string",
    )
    model = train_reference_model(docs)
    bench = spark.createDataFrame([(999, "zzz yyy xxx www vvv uuu")],
                                  "doc_id long, text string")
    kept = curate_batch(
        docs, lm_model=model, benchmark=bench, decontaminate_n=5,
        min_tokens=2, min_stopword_ratio=0.0, max_punct_ratio=1.0,
        max_ppl=1e9, max_top2gram=1.0,
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 in ids, "gram-less short doc was silently dropped"
    assert 2 in ids
