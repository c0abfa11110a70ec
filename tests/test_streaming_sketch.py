"""Streaming CMS/HLL maintenance: merged store ≡ batch sketch on union."""

from __future__ import annotations

import glob
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


def test_streamed_sketches_equal_batch_union(spark, tmp_path):
    from pyspark.sql import functions as F

    from transmog_spark.operators.sketch import (
        cms_sketch,
        hdr_histogram,
        hdr_quantiles,
        hll_estimate,
        hll_registers,
    )
    from transmog_spark.operators.text import ws_tokens
    from transmog_spark.streaming.sketch import (
        read_cms,
        read_hdr,
        read_hll,
        sketch_foreach_batch,
    )

    batches = [
        [(1, "apple banana apple cherry"), (2, "banana cherry date")],
        [(3, "apple date elderberry fig"), (4, "cherry cherry date grape")],
        [(5, "apple banana cherry date elderberry fig grape")],
    ]
    schema = "doc_id long, text string"
    src = _stage_batches(spark, tmp_path, batches, schema)
    store = str(tmp_path / "sketches")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            sketch_foreach_batch(store, depth=4, width=32, p=12)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    union = spark.createDataFrame([r for b in batches for r in b], schema)
    batch_cms = sorted(
        map(tuple, cms_sketch(union, depth=4, width=32).collect())
    )
    batch_hll = sorted(map(tuple, hll_registers(union, p=12).collect()))
    stream_cms = sorted(map(tuple, read_cms(spark, store).collect()))
    stream_hll = sorted(map(tuple, read_hll(spark, store).collect()))
    assert stream_cms == batch_cms and len(stream_cms) > 0
    assert stream_hll == batch_hll and len(stream_hll) > 0

    # HDR token-count histogram: streamed == batch over union, and the
    # merged buckets answer quantile reads
    ntok = union.select(
        F.size(ws_tokens(F.col("text"))).cast("long").alias("__ntok")
    )
    batch_hdr = sorted(map(tuple, hdr_histogram(ntok, "__ntok", k=32).collect()))
    stream_hdr = sorted(map(tuple, read_hdr(spark, store).collect()))
    assert stream_hdr == batch_hdr and len(stream_hdr) > 0
    med = hdr_quantiles(read_hdr(spark, store), [0.5], k=32).collect()[0]
    assert med.est_lo <= 4 <= med.est_hi  # doc token counts: 3,4,4,4,7

    # the merged registers estimate the union's cardinality
    est = hll_estimate(read_hll(spark, store), p=12).collect()[0]
    assert abs(est["hll_est"] - 7) < 1.0  # 7 distinct tokens

    # committed-batch replay is an exact no-op (CMS + is not idempotent)
    handler = sketch_foreach_batch(store, depth=4, width=32, p=12)
    handler(spark.createDataFrame(batches[2], schema), 2)
    again = sorted(map(tuple, read_cms(spark, store).collect()))
    assert again == batch_cms

    # superseded generations are GC'd: exactly one cms/hll dir remains
    assert len(glob.glob(os.path.join(store, "cms-g*"))) == 1
    assert len(glob.glob(os.path.join(store, "hll-g*"))) == 1


def test_crash_orphan_generation_is_replaced_on_retry(spark, tmp_path):
    """A crash after the gen-dir writes but before the meta flip leaves
    orphan dirs; the batch retry must replace them, not error out."""
    import json

    from transmog_spark.operators.sketch import cms_sketch
    from transmog_spark.streaming.sketch import read_cms, sketch_foreach_batch

    schema = "doc_id long, text string"
    store = str(tmp_path / "s")
    handler = sketch_foreach_batch(store, depth=4, width=32, p=12)
    b0 = spark.createDataFrame([(1, "apple banana")], schema)
    handler(b0, 0)

    # simulate the crash window: write the NEXT generation dirs, no meta flip
    spark.createDataFrame([(0, 0, 999)], "d int, bucket int, cnt long") \
        .write.parquet(os.path.join(store, "cms-g2"))
    spark.createDataFrame([(0, 1)], "bucket long, reg int") \
        .write.parquet(os.path.join(store, "hll-g2"))

    b1 = spark.createDataFrame([(2, "cherry date")], schema)
    handler(b1, 1)  # retry path: must overwrite the orphans, not raise

    union = spark.createDataFrame(
        [(1, "apple banana"), (2, "cherry date")], schema
    )
    got = sorted(map(tuple, read_cms(spark, store).collect()))
    want = sorted(map(tuple, cms_sketch(union, depth=4, width=32).collect()))
    assert got == want  # the bogus 999 cell is gone
    with open(os.path.join(store, "_sketch_meta.json")) as fh:
        assert json.load(fh)["gen"] == 2
