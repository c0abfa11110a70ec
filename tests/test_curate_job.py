"""e2e for jobs/curate_corpus.py: raw docs -> curated, ordered shards,
checkpointed resume, manifest verification."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from jobs.curate_corpus import main as curate_main


def _run(spark, sf_dir, tmp_path, sub: str, extra: list[str] | None = None):
    out = str(tmp_path / sub / "out")
    ckpt = str(tmp_path / sub / "ckpt")
    rc = curate_main(
        [
            "--docs", os.path.join(sf_dir, "documents.parquet"),
            "--output", out,
            "--checkpoint", ckpt,
            "--n-shards", "4",
            "--shuffle-partitions", "8",
        ]
        + (extra or [])
    )
    assert rc == 0
    return out, ckpt


def test_curate_job_end_to_end(spark, sf_dir, tmp_path):
    from transmog_spark.operators.corpus import training_order
    from transmog_spark.streaming.curation import curate_batch
    from transmog_spark.streaming.quality import train_reference_model

    out, ckpt = _run(spark, sf_dir, tmp_path, "a")

    data = spark.read.parquet(os.path.join(out, "data"))
    mani = spark.read.parquet(os.path.join(out, "manifests"))

    # every configured shard written; ordering fields complete
    assert {r["shard"] for r in data.select("shard").distinct().collect()} == {
        0, 1, 2, 3
    }
    assert data.where(F.col("tok_offset").isNull()).count() == 0

    # manifests agree with the written data, shard for shard
    per = {
        r["shard"]: (r["n"], r["tok"])
        for r in data.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok"))
        .collect()
    }
    for m in mani.collect():
        assert per[m["shard"]] == (m["n_rows"], m["tok_total"])

    # the job's output EQUALS the library chain run directly
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench = docs.where("doc_id % 97 = 0")
    corpus = docs.where("NOT (doc_id % 97 = 0)")
    model = train_reference_model(corpus, train_pct=80)
    kept = curate_batch(corpus, lm_model=model, benchmark=bench)
    order = training_order(kept, n_shards=4, ntok_col="n_tok")
    expected = sorted(
        map(
            tuple,
            kept.join(
                order.select("doc_id", "shard", "shard_pos", "tok_offset"),
                "doc_id",
            ).collect(),
        )
    )
    got = sorted(
        map(tuple, data.select(*kept.columns, "shard", "shard_pos", "tok_offset").collect())
    )
    assert got == expected and len(got) > 0
    for frame in model:
        frame.unpersist()


def test_curate_job_resume_skips_committed_shards(spark, sf_dir, tmp_path):
    import uuid

    from transmog_spark.checkpoint import CheckpointStore

    # pre-commit shard 0 in a fresh checkpoint: the job must skip it
    ckpt_dir = str(tmp_path / "b" / "ckpt")
    store = CheckpointStore(spark, ckpt_dir)
    store.commit("0", None, rows_in=0, rows_out=0, run_id=uuid.uuid4().hex[:12])

    out = str(tmp_path / "b" / "out")
    rc = curate_main(
        [
            "--docs", os.path.join(sf_dir, "documents.parquet"),
            "--output", out,
            "--checkpoint", ckpt_dir,
            "--n-shards", "4",
            "--shuffle-partitions", "8",
        ]
    )
    assert rc == 0
    data = spark.read.parquet(os.path.join(out, "data"))
    shards = {r["shard"] for r in data.select("shard").distinct().collect()}
    assert shards == {1, 2, 3}  # 0 skipped as already-committed

    # second full run over the completed checkpoint is a no-op on data
    before = data.count()
    rc = curate_main(
        [
            "--docs", os.path.join(sf_dir, "documents.parquet"),
            "--output", out,
            "--checkpoint", ckpt_dir,
            "--n-shards", "4",
            "--shuffle-partitions", "8",
        ]
    )
    assert rc == 0
    after = spark.read.parquet(os.path.join(out, "data")).count()
    assert after == before


def test_curate_job_classifier_gate(spark, sf_dir, tmp_path):
    from transmog_spark.operators.nb import nb_gate, nb_model

    out, _ = _run(
        spark, sf_dir, tmp_path, "nb",
        ["--classifier-target", "src0", "--classifier-margin", "0.5"],
    )
    data = spark.read.parquet(os.path.join(out, "data"))

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = docs.where("NOT (doc_id % 97 = 0)")
    model = nb_model(corpus, train_pct=100)
    admitted = {
        r["doc_id"]
        for r in nb_gate(
            corpus, target="src0", min_margin=0.5, model=model
        ).collect()
    }
    written = {r["doc_id"] for r in data.select("doc_id").collect()}
    # every written doc passed the admission gate; gate ran before the
    # rest of the chain, which may drop more (dedup, quality, spans)
    assert written and written <= admitted


def test_curate_job_coreset_stage(spark, sf_dir, tmp_path):
    """--coreset-per-cell keeps only the per-cluster diverse MMR picks: the
    written docs equal diverse_sample over the curated survivors' embedding
    slice, within the nlist x per_cell budget."""
    from transmog_spark.operators.similarity import diverse_sample
    from transmog_spark.streaming.curation import curate_batch
    from transmog_spark.streaming.quality import train_reference_model

    out, _ = _run(
        spark, sf_dir, tmp_path, "coreset",
        [
            "--embeddings", os.path.join(sf_dir, "embeddings.parquet"),
            "--coreset-per-cell", "3",
            "--coreset-nlist", "4",
        ],
    )
    data = spark.read.parquet(os.path.join(out, "data"))
    written = {r["doc_id"] for r in data.select("doc_id").collect()}
    assert 0 < len(written) <= 4 * 3

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench = docs.where("doc_id % 97 = 0")
    corpus = docs.where("NOT (doc_id % 97 = 0)")
    model = train_reference_model(corpus, train_pct=80)
    kept = curate_batch(corpus, lm_model=model, benchmark=bench)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    surviving = emb.join(kept.select("doc_id"), "doc_id")
    expected = {
        r["doc_id"]
        for r in diverse_sample(
            surviving, id_col="doc_id", vec_col="embedding", dim=64,
            nlist=4, per_cell=3, lam=0.5,
        ).collect()
    }
    assert written == expected
    for frame in model:
        frame.unpersist()


def test_curate_job_strip_html_front_door(spark, sf_dir, tmp_path):
    # wrap the corpus in markup, run with --strip-html, and assert the
    # curated output matches a plain run over the unwrapped corpus: markup
    # removal ahead of the chain must be verdict-invariant
    import pyspark.sql.functions as SF

    from transmog_spark.operators.text import demo_html

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    wrapped_path = str(tmp_path / "wrapped")
    # demo_html inserts 'Doc <id>' headers and <b> wraps; build a simpler
    # wrapper that strips back to EXACTLY the original text
    docs.withColumn(
        "text",
        SF.concat(
            SF.lit("<html><body><script>var x = 1;</script><p>"),
            SF.col("text"),
            SF.lit("</p><!-- tail --></body></html>"),
        ),
    ).write.mode("overwrite").parquet(wrapped_path)

    out_html = str(tmp_path / "h" / "out")
    rc = curate_main(
        [
            "--docs", wrapped_path,
            "--output", out_html,
            "--checkpoint", str(tmp_path / "h" / "ckpt"),
            "--n-shards", "4",
            "--shuffle-partitions", "8",
            "--strip-html",
        ]
    )
    assert rc == 0
    out_plain, _ = _run(spark, sf_dir, tmp_path, "p")

    a = spark.read.parquet(os.path.join(out_html, "data"))
    b = spark.read.parquet(os.path.join(out_plain, "data"))
    ra = sorted(((r["shard"], r["tok_offset"], r["doc_id"]) for r in a.collect()))
    rb = sorted(((r["shard"], r["tok_offset"], r["doc_id"]) for r in b.collect()))
    assert ra == rb


def test_curate_job_c4_clean_front_door(spark, sf_dir, tmp_path):
    # re-line the corpus so every page passes the C4 rules with its exact
    # token stream intact (6-word punctuated lines), plus two poison pages
    # (lorem / brace) that --c4-clean must drop before the chain
    import pyspark.sql.functions as SF

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    relined = docs.withColumn(
        "text",
        SF.concat_ws(
            "\n",
            SF.transform(
                SF.split(
                    SF.regexp_replace(
                        SF.col("text"), r"((\S+\s+){5}\S+)\s+", "$1\n"
                    ),
                    "\n",
                ),
                lambda l: SF.concat(l, SF.lit(" EOL.")),
            ),
        ),
    )
    poison = spark.createDataFrame(
        [
            (900001, "lorem ipsum filler page here.", "en", "src0", 29),
            (900002, "this page has { code } in it.", "en", "src0", 29),
        ],
        relined.schema,
    )
    path = str(tmp_path / "relined")
    relined.unionByName(poison).write.mode("overwrite").parquet(path)

    out = str(tmp_path / "c4" / "out")
    rc = curate_main(
        [
            "--docs", path,
            "--output", out,
            "--checkpoint", str(tmp_path / "c4" / "ckpt"),
            "--n-shards", "4",
            "--shuffle-partitions", "8",
            "--c4-clean",
        ]
    )
    assert rc == 0
    shards = spark.read.parquet(os.path.join(out, "data"))
    ids = {r["doc_id"] for r in shards.select("doc_id").collect()}
    assert 900001 not in ids and 900002 not in ids  # poison pages dropped
    assert len(ids) > 100  # the relined corpus flows through the chain
