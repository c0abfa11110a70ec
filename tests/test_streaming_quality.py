"""Streaming quality gate: batch ≡ stream parity on a real availableNow run."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.quality import quality_gate
from transmog_spark.streaming.quality import (
    quality_gate_foreach_batch,
    train_reference_model,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def test_stream_matches_batch_with_shared_model(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    # static reference = hash-half of the corpus; stream = the other half
    ref = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1)
    model = train_reference_model(ref)

    expected = {
        r["doc_id"]: (r["verdict"], r["n_pii"], r["ppl"])
        for r in quality_gate(incoming, lm_model=model).collect()
    }

    # real streaming run: file source, several input files -> several
    # batches under maxFilesPerTrigger, collected through foreachBatch
    src = str(tmp_path / "src")
    incoming.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    got: dict = {}

    def sink(verdicts, batch_id):
        for r in verdicts.collect():
            got[r["doc_id"]] = (r["verdict"], r["n_pii"], r["ppl"])

    q = (
        stream.writeStream.foreachBatch(
            quality_gate_foreach_batch(sink, lm_model=model)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert got == expected
    assert len(got) > 0


def test_pretrained_model_changes_ppl_not_shape(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(200)
    model = train_reference_model(docs.where(F.col("doc_id") % 3 == 0))
    out = quality_gate(docs, lm_model=model)
    rows = out.collect()
    assert len(rows) == 200
    assert set(out.columns) == {
        "doc_id", "n_tokens_ws", "stopword_ratio", "top_2gram_frac",
        "ppl", "n_pii", "verdict",
    }


def test_nb_stream_admission_matches_batch(spark, sf_dir, tmp_path):
    from transmog_spark.operators.nb import nb_gate, nb_model
    from transmog_spark.streaming.quality import nb_gate_foreach_batch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    ref = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1)
    model = nb_model(ref, train_pct=100)
    for frame in model:
        frame.persist()
    try:
        expected = {
            r["doc_id"]
            for r in nb_gate(
                incoming, target="src0", min_margin=0.5, model=model
            ).collect()
        }

        src = str(tmp_path / "nbsrc")
        incoming.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(incoming.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        got: set = set()

        def sink(kept, batch_id):
            got.update(r["doc_id"] for r in kept.collect())

        q = (
            stream.writeStream.foreachBatch(
                nb_gate_foreach_batch(
                    sink, nb_model=model, target="src0", min_margin=0.5
                )
            )
            .option("checkpointLocation", str(tmp_path / "nbchk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        assert got == expected
        assert len(got) > 0
    finally:
        for frame in model:
            frame.unpersist()
