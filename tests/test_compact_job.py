"""e2e for jobs/compact_curated.py: stream N batches into a curated store,
run the compaction job, and assert the compacted store EQUALS the batch
flagship chain on the union input.

The scenario is the streaming regime the compaction exists for: exact and
near duplicates arrive in DIFFERENT micro-batches (so within-batch dedup
can't see them) and duplicated spans accumulate across batches — only the
global compaction pass collapses them, and its output must match what a
single batch run over everything would have produced.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from transmog_spark.streaming.curation import curate_batch, curation_foreach_batch
from transmog_spark.streaming.quality import train_reference_model

SPAN = "zebra yak xylo wolf viper tiger snake rhino"  # 8-token span

RELAXED = dict(
    min_tokens=5,
    min_word_len=0.0,
    max_word_len=100.0,
    max_punct_ratio=1.0,
    min_stopword_ratio=0.0,
    max_top2gram=1.0,
    max_ppl=1e18,
    max_pii=100,
)
CHAIN = dict(decontaminate_n=3, near_threshold=0.5, span_n=8, span_min_count=2)


def _doc(prefix: str, n: int = 24) -> str:
    # per-prefix UNIQUE token stream: no accidental near-dups across docs
    return " ".join(f"{prefix}{j}" for j in range(n))


def _batches():
    exact = _doc("a")  # docs 1 and 31 carry this verbatim
    near = _doc("b")  # docs 2 and 32 differ only in the final token
    return [
        [  # batch 0
            (1, "web", exact),
            (2, "web", near + " two"),
            (5, "book", _doc("c") + " " + SPAN),
            (4, "web", "too short doc"),  # fails the gate (min_tokens=5)
        ],
        [  # batch 1
            (31, "web", exact),  # exact dup of 1, cross-batch
            (32, "web", near + " too"),  # near-dup of 2, cross-batch
            (35, "book", _doc("d") + " " + SPAN),  # repeats the span
        ],
        [  # batch 2
            (61, "book", _doc("e")),
            (62, "web", " ".join(["bench gram overlap"] * 12)),  # contaminated
        ],
    ]


def test_stream_then_compact_equals_batch_flagship(spark, tmp_path):
    batches = _batches()
    schema = "doc_id long, source string, text string"
    union_df = spark.createDataFrame(
        [r for b in batches for r in b], schema
    ).persist()
    model = train_reference_model(union_df)
    bench = spark.createDataFrame([(999, "bench gram overlap " * 4)],
                                  "doc_id long, text string").persist()

    # ---- stage the batches as one file each and stream them ------------
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, src / f"b{i}.parquet")

    store = str(tmp_path / "store")

    def sink(kept, batch_id):
        kept.write.mode("append").partitionBy("source").parquet(store)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            curation_foreach_batch(
                sink, lm_model=model, benchmark=bench, keep_text=True,
                **RELAXED, **CHAIN,
            )
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    # cross-batch duplicates must still be present in the raw store
    store_ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert {1, 31} <= store_ids and {2, 32} <= store_ids

    # ---- compact -------------------------------------------------------
    import jobs.compact_curated as job

    out = str(tmp_path / "compacted")
    ckpt = str(tmp_path / "ckpt")
    assert job.main([
        "--store", store, "--output", out, "--checkpoint", ckpt,
    ]) == 0

    got = {
        (r["doc_id"], r["source"], r["n_tok"])
        for r in spark.read.parquet(out)
        .select("doc_id", "source", "n_tok")
        .collect()
    }
    expected = {
        (r["doc_id"], r["source"], r["n_tok"])
        for r in curate_batch(
            union_df, lm_model=model, benchmark=bench, **RELAXED, **CHAIN
        ).collect()
    }
    assert got == expected
    # the chain actually exercised every stage: gate drop, contamination
    # drop, exact-dup collapse, near-dup collapse
    kept_ids = {g[0] for g in got}
    assert 4 not in kept_ids and 62 not in kept_ids
    assert 1 in kept_ids and 31 not in kept_ids
    assert 2 in kept_ids and 32 not in kept_ids

    # ---- idempotent re-run: every slice already committed, store equal --
    assert job.main([
        "--store", store, "--output", out, "--checkpoint", ckpt,
    ]) == 0
    again = {
        (r["doc_id"], r["source"], r["n_tok"])
        for r in spark.read.parquet(out)
        .select("doc_id", "source", "n_tok")
        .collect()
    }
    assert again == got
    union_df.unpersist()
    bench.unpersist()
