"""Stream-static as-of enrichment: batch ≡ stream parity on availableNow
runs (streaming/asof.py). The serving-side half of the training/serving-
skew guarantee: the stream's enriched rows must equal the batch
``asof_join`` on the same inputs, per micro-batch and in union.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from transmog_spark.operators.asof import asof_join
from transmog_spark.streaming.asof import enrich_batch, enrich_foreach_batch


def _frames(spark):
    events = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5), (2, 30), (3, 7)],
        "doc_id long, ts long",
    )
    features = spark.createDataFrame(
        [(1, 0, 1.0), (1, 20, 2.0), (1, 40, 3.0), (2, 10, 5.0)],
        "doc_id long, ts long, feature_v double",
    )
    return events, features


def _key(r):
    return (r["doc_id"], r["ts"])


def _run_stream(spark, schema, src, chk, features, max_files=None):
    got: dict = {}

    def sink(df, batch_id):
        for r in df.collect():
            assert _key(r) not in got, "event crossed batches"
            got[_key(r)] = r["feature_v"]

    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    q = (
        reader.parquet(src)
        .writeStream.foreachBatch(
            enrich_foreach_batch(sink, features=features, on="doc_id")
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return got


def test_stream_enrichment_equals_batch_asof(spark, tmp_path):
    events, features = _frames(spark)
    expected = {
        _key(r): r["feature_v"]
        for r in asof_join(events, features, "doc_id").collect()
    }
    src = str(tmp_path / "src1")
    events.coalesce(1).write.parquet(src)
    got = _run_stream(spark, events.schema, src, str(tmp_path / "chk1"), features)
    assert got == expected
    # spot-check the PIT semantics themselves
    assert got[(1, 25)] == 2.0 and got[(1, 40)] == 3.0
    assert got[(2, 5)] is None and got[(3, 7)] is None


def test_multi_batch_stream_parity_and_union(spark, tmp_path):
    events, features = _frames(spark)
    src = str(tmp_path / "src2")
    events.where(F.col("ts") < 20).coalesce(1).write.parquet(src)
    events.where(F.col("ts") >= 20).coalesce(1).write.mode("append").parquet(src)
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    assert len(files) == 2

    got = _run_stream(
        spark, events.schema, src, str(tmp_path / "chk2"), features, max_files=1
    )
    # union across micro-batches == batch as-of on the whole input
    expected = {
        _key(r): r["feature_v"]
        for r in asof_join(events, features, "doc_id").collect()
    }
    assert got == expected


def test_callable_feature_source_re_resolves_per_batch(spark, tmp_path):
    events, features = _frames(spark)
    calls = []

    def feature_source():
        calls.append(1)
        return features

    src = str(tmp_path / "src3")
    events.where(F.col("ts") < 20).coalesce(1).write.parquet(src)
    events.where(F.col("ts") >= 20).coalesce(1).write.mode("append").parquet(src)
    _run_stream(
        spark, events.schema, src, str(tmp_path / "chk3"),
        feature_source, max_files=1,
    )
    assert len(calls) == 2  # one resolve per micro-batch


def test_enrich_batch_passes_asof_kwargs(spark):
    events, features = _frames(spark)
    out = {
        _key(r): r["feature_v"]
        for r in enrich_batch(events, features, strict=True).collect()
    }
    # strict: the ts=40 feature write is NOT visible to the ts=40 event
    assert out[(1, 40)] == 2.0
