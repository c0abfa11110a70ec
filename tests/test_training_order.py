"""training_order / shard_manifest: determinism, coverage, offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.corpus import shard_manifest, training_order


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("ntok")
    )


def test_partition_invariance_and_coverage(spark):
    d1 = _docs(spark).repartition(1)
    d16 = _docs(spark).repartition(16)
    r1 = sorted(training_order(d1, n_shards=4, seed="s").collect())
    r16 = sorted(training_order(d16, n_shards=4, seed="s").collect())
    assert r1 == r16  # partition-order independent
    # every doc exactly once; shard_pos is a dense 0..k-1 per shard
    assert len(r1) == 200
    by_shard: dict[int, list[int]] = {}
    for doc_id, shard, pos in r1:
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_seed_changes_order_not_coverage(spark):
    a = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in
         training_order(_docs(spark), n_shards=4, seed="a").collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in
         training_order(_docs(spark), n_shards=4, seed="b").collect()}
    assert set(a) == set(b)
    assert sum(a[k] != b[k] for k in a) > 100  # a real reshuffle


def test_tok_offsets_are_exclusive_prefix_sums(spark):
    rows = training_order(
        _docs(spark), n_shards=2, seed="s", ntok_col="ntok"
    ).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["shard_pos"])
        acc = 0
        for r in shard_rows:
            assert r["tok_offset"] == acc
            acc += r["n_tok"]


def test_manifest_matches_order(spark):
    d = _docs(spark)
    order = training_order(d, n_shards=4, seed="s", ntok_col="ntok").collect()
    man = {r["shard"]: r for r in
           shard_manifest(d, n_shards=4, seed="s", ntok_col="ntok").collect()}
    import hashlib
    by_shard: dict[int, list] = {}
    for r in order:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["shard_pos"])
        assert man[shard]["n_rows"] == len(rows)
        assert man[shard]["tok_total"] == sum(r["n_tok"] for r in rows)
        ids = ",".join(str(r["doc_id"]) for r in rows)
        assert man[shard]["ids_md5"] == hashlib.md5(ids.encode()).hexdigest()
