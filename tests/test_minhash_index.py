"""Incremental MinHash-LSH near-dup store: increments ≡ rebuild, probe
semantics, streaming admission parity."""

from __future__ import annotations

import glob
import json
import os
import shutil


from transmog_spark.operators.minhash_index import (
    minhash_index,
    minhash_index_update,
    minhash_probe,
)

SCHEMA = "doc_id long, text string"

# doc 1 and 101 are near-identical (one token edited); 2/3 unrelated
STORE_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different content about spark shuffle partitions here"),
    (3, "yet another unrelated document mentioning parquet column pruning"),
]
PROBE_ROWS = [
    (101, "the quick brown fox jumps over the lazy cat near the river bank"),
    (102, "nothing in common with anything stored so far at all honestly"),
]


def _probe_set(spark, path, rows=PROBE_ROWS, threshold=0.5):
    probe = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        map(tuple, minhash_probe(spark, path, probe, threshold=threshold).collect())
    )


def test_increments_equal_rebuild(spark, tmp_path):
    full = str(tmp_path / "full")
    minhash_index(spark.createDataFrame(STORE_ROWS, SCHEMA), full)

    inc = str(tmp_path / "inc")
    minhash_index(spark.createDataFrame(STORE_ROWS[:1], SCHEMA), inc)
    minhash_index_update(
        spark, spark.createDataFrame(STORE_ROWS[1:], SCHEMA), inc
    )

    assert _probe_set(spark, inc) == _probe_set(spark, full)
    with open(os.path.join(inc, "_minhash_index_meta.json")) as fh:
        assert json.load(fh)["n_docs"] == 3


def test_probe_flags_near_dup_only(spark, tmp_path):
    path = str(tmp_path / "idx")
    minhash_index(spark.createDataFrame(STORE_ROWS, SCHEMA), path)
    out = _probe_set(spark, path)
    # 101 matches its edited twin 1 with high signature agreement;
    # 102 matches nothing
    assert [(p, m) for p, m, _ in out] == [(101, 1)]
    assert out[0][2] >= 0.5
    # raising the threshold above the agreement drops the match
    assert _probe_set(spark, path, threshold=1.01) == []


def test_probe_excludes_self_match(spark, tmp_path):
    path = str(tmp_path / "idx2")
    minhash_index(spark.createDataFrame(STORE_ROWS, SCHEMA), path)
    # probing a document the store already contains (same id) must not
    # flag it against itself
    out = _probe_set(spark, path, rows=STORE_ROWS[1:2], threshold=0.5)
    assert out == []


def test_update_uses_frozen_params(spark, tmp_path):
    path = str(tmp_path / "idx3")
    minhash_index(
        spark.createDataFrame(STORE_ROWS[:1], SCHEMA), path,
        num_hashes=8, bands=2, n_buckets=16,
    )
    minhash_index_update(
        spark, spark.createDataFrame(STORE_ROWS[1:], SCHEMA), path
    )
    # probe scores land on the 1/8 grid -> params came from the meta file
    out = _probe_set(spark, path)
    assert out and all(round(s * 8, 6) == int(round(s * 8)) for _, _, s in out)


def _stage_batches(spark, tmp_path, batches):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, src / f"b{i}.parquet")
    return str(src)


def test_streaming_admission_parity(spark, tmp_path):
    from transmog_spark.streaming.minhash import (
        minhash_admission_foreach_batch,
    )

    batches = [STORE_ROWS[:2], STORE_ROWS[2:] + [PROBE_ROWS[1]], PROBE_ROWS[:1]]
    src = _stage_batches(spark, tmp_path, batches)

    idx = str(tmp_path / "stream_idx")
    matches = str(tmp_path / "matches")
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            minhash_admission_foreach_batch(idx, matches, threshold=0.5)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    # the batch-3 arrival (101) is flagged against the batch-1 admit (1)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(matches)
            .select("probe_id", "match_id", "batch_id")
            .collect(),
        )
    )
    assert got == [(101, 1, 2)]

    # the store now equals a full build over the union (probe parity)
    full = str(tmp_path / "full_union")
    union = spark.createDataFrame([r for b in batches for r in b], SCHEMA)
    minhash_index(union, full)
    extra = [(999, "the quick brown fox jumps over the lazy dog near a river bank")]
    assert _probe_set(spark, idx, rows=extra) == _probe_set(spark, full, rows=extra)

    with open(os.path.join(idx, "_minhash_index_meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_docs"] == 5 and meta["last_batch_id"] == 2

    # committed-batch replay: exact no-op (no double store, no re-emit)
    handler = minhash_admission_foreach_batch(idx, matches, threshold=0.5)
    handler(spark.createDataFrame(batches[2], SCHEMA), 2)
    with open(os.path.join(idx, "_minhash_index_meta.json")) as fh:
        assert json.load(fh)["n_docs"] == 5
    assert spark.read.parquet(matches).count() == 1


def test_hot_buckets_skipped(spark, tmp_path):
    path = str(tmp_path / "idx4")
    # two identical store docs make every one of their buckets size 2
    rows = [STORE_ROWS[0], (4, STORE_ROWS[0][1]), STORE_ROWS[1]]
    minhash_index(spark.createDataFrame(rows, SCHEMA), path)
    # max_bucket=1 skips those hot buckets -> the near-dup probe finds
    # nothing; the default bound keeps them
    probe = spark.createDataFrame(PROBE_ROWS[:1], SCHEMA)
    none = minhash_probe(spark, path, probe, threshold=0.5, max_bucket=1)
    assert none.collect() == []
    got = sorted(
        r["match_id"]
        for r in minhash_probe(spark, path, probe, threshold=0.5).collect()
    )
    assert got == [1, 4]
