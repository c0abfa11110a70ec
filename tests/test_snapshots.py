"""Snapshot-versioned tables: append/overwrite lineage, time travel,
crash invisibility, expiry GC, and the training-order pinning use case."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transmog_spark.sources.snapshots import (
    expire_snapshots,
    snapshot_log,
    snapshot_read,
    snapshot_write,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("val")
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = snapshot_write(_df(spark, 0, 10), root)
    v2 = snapshot_write(_df(spark, 10, 15), root, mode="append")
    v3 = snapshot_write(_df(spark, 100, 103), root, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)

    assert snapshot_read(spark, root, version=1).count() == 10
    assert snapshot_read(spark, root, version=2).count() == 15
    # latest = the overwrite
    ids = {r["doc_id"] for r in snapshot_read(spark, root).collect()}
    assert ids == {100, 101, 102}

    # time travel by timestamp lands on the snapshot current at that time
    log = snapshot_log(root)
    at_v2 = snapshot_read(spark, root, as_of_ms=log[1]["timestamp_ms"])
    assert at_v2.count() == 15
    # pinned snapshots are immutable views: v2 unchanged after v3
    assert snapshot_read(spark, root, version=2).count() == 15


def test_uncommitted_data_invisible_and_gc(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 5), root)
    # simulate a crash between data write and manifest commit: a data dir
    # with no manifest reference must be invisible to every reader
    orphan = os.path.join(root, "data", "gen-9-deadbeef")
    _df(spark, 500, 600).write.parquet(orphan)
    assert snapshot_read(spark, root).count() == 5

    snapshot_write(_df(spark, 5, 8), root, mode="append")
    res = expire_snapshots(root, keep_last=1)
    assert res["kept"] == [2]
    # orphan and nothing else referenced by v2 got collected; v2 intact
    assert not os.path.isdir(orphan)
    assert snapshot_read(spark, root).count() == 8
    # expired version no longer readable
    import pytest

    with pytest.raises(ValueError):
        snapshot_read(spark, root, version=1)


def test_pinned_training_order_reproducible(spark, tmp_path):
    """The use case: training_order over a pinned snapshot is identical
    later even after further ingest."""
    from transmog_spark.operators.corpus import training_order

    root = str(tmp_path / "docs")
    rows = [(i, f"doc text {i}", "web") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    v = snapshot_write(df, root)

    def order_at(version):
        snap = snapshot_read(spark, root, version=version)
        return [
            r["doc_id"]
            for r in training_order(snap, id_col="doc_id", seed="7")
            .orderBy("shard", "shard_pos")
            .collect()
        ]

    first = order_at(v)
    # ingest continues
    more = spark.createDataFrame(
        [(1000 + i, f"late doc {i}", "web") for i in range(20)],
        "doc_id long, text string, source string",
    )
    snapshot_write(more, root, mode="append")
    assert order_at(v) == first
    assert len(first) == 50


def test_snapshot_diff_append_and_overwrite(spark, tmp_path):
    from transmog_spark.sources.snapshots import snapshot_diff

    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"d{i}", "web" if i % 2 == 0 else "books") for i in range(10)],
        "doc_id long, text string, source string",
    )
    v1 = snapshot_write(base, root, mode="overwrite")
    extra = spark.createDataFrame(
        [(100 + i, f"x{i}", "web") for i in range(4)],
        "doc_id long, text string, source string",
    )
    v2 = snapshot_write(extra, root, mode="append")

    # append: additions counted from the delta dirs only, nothing removed
    d = {r.source: r for r in snapshot_diff(spark, root, v1, v2).collect()}
    assert d["web"].n_added == 4 and d["web"].n_removed == 0
    assert (d["web"].n_old, d["web"].n_new) == (5, 9)
    assert d["books"].n_added == 0 and d["books"].n_removed == 0
    assert (d["books"].n_old, d["books"].n_new) == (5, 5)

    # overwrite: full compare — docs 0-4 and 100-103 gone, 0-2 re-ingested
    # under a new source plus one brand-new doc
    repl = spark.createDataFrame(
        [(i, f"d{i}", "curated") for i in range(3)]
        + [(5 + i, f"d{5+i}", "web" if (5 + i) % 2 == 0 else "books") for i in range(5)]
        + [(999, "new", "web")],
        "doc_id long, text string, source string",
    )
    v3 = snapshot_write(repl, root, mode="overwrite")
    d = {r.source: r for r in snapshot_diff(spark, root, v2, v3).collect()}
    assert d["curated"].n_added == 3 and d["curated"].n_old == 0
    # web lost 0,2,4 (even ids < 5, now curated/absent) and 100-103; gained 999
    assert d["web"].n_added == 1 and d["web"].n_removed == 7
    assert d["books"].n_removed == 2  # ids 1, 3
    assert d["books"].n_added == 0

    # identity diff: all zeros
    for r in snapshot_diff(spark, root, v3, v3).collect():
        assert r.n_added == 0 and r.n_removed == 0 and r.n_old == r.n_new
