"""Checkpoint/resume tests: per-partition watermarks, resumable backfill."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from transmog_spark.checkpoint import CheckpointStore


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_empty_store_filters_nothing(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "wm"))
    df = spark.createDataFrame(
        [("p1", _ts("2024-01-01T00:00:00")), ("p2", _ts("2024-01-02T00:00:00"))],
        "part string, ts timestamp",
    )
    assert store.filter_resumable(df, "part", "ts").count() == 2


def test_commit_and_resume_filter(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "wm"))
    rows = [
        ("p1", _ts("2024-01-01T00:00:00")),
        ("p1", _ts("2024-01-02T00:00:00")),
        ("p1", _ts("2024-01-03T00:00:00")),
        ("p2", _ts("2024-01-01T12:00:00")),
    ]
    df = spark.createDataFrame(rows, "part string, ts timestamp")
    store.commit(
        "p1", _ts("2024-01-02T00:00:00"), rows_in=2, rows_out=2, run_id="r1"
    )
    remaining = store.filter_resumable(df, "part", "ts").collect()
    got = sorted((r.part, r.ts.isoformat()) for r in remaining)
    # p1 rows at/below the watermark drop; p2 untouched (no watermark)
    assert got == [("p1", "2024-01-03T00:00:00"), ("p2", "2024-01-01T12:00:00")]


def test_latest_watermark_wins_across_commits(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "wm"))
    store.commit("p1", _ts("2024-01-01T00:00:00"), rows_in=1, rows_out=1, run_id="r1")
    store.commit("p1", _ts("2024-01-05T00:00:00"), rows_in=4, rows_out=4, run_id="r2")
    wm = {r.partition_key: r.watermark for r in store.watermarks().collect()}
    assert wm["p1"].isoformat() == "2024-01-05T00:00:00"


def test_lineage_metrics_queryable(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "wm"))
    store.commit(
        "src_hot",
        _ts("2024-01-02T00:00:00"),
        rows_in=100,
        rows_out=98,
        child_rows=250,
        run_id="r1",
    )
    row = store.read().collect()[0]
    assert (row.rows_in, row.rows_out, row.child_rows, row.run_id) == (100, 98, 250, "r1")


def test_resume_is_idempotent_end_to_end(spark, tmp_path):
    """Simulated two-phase backfill: phase 1 commits p1; phase 2 resumes and
    only processes what's left; a third run is a no-op."""
    store = CheckpointStore(spark, str(tmp_path / "wm"))
    df = spark.createDataFrame(
        [("p1", _ts("2024-01-01T00:00:00")), ("p1", _ts("2024-01-02T00:00:00")),
         ("p2", _ts("2024-01-01T06:00:00"))],
        "part string, ts timestamp",
    )
    # phase 1: process p1 fully, commit its max ts
    p1_max = df.where(F.col("part") == "p1").agg(F.max("ts")).collect()[0][0]
    store.commit("p1", p1_max, rows_in=2, rows_out=2, run_id="r1")
    # phase 2: resume -> only p2 remains
    rest = store.filter_resumable(df, "part", "ts")
    assert {r.part for r in rest.collect()} == {"p2"}
    p2_max = rest.agg(F.max("ts")).collect()[0][0]
    store.commit("p2", p2_max, rows_in=1, rows_out=1, run_id="r2")
    # phase 3: nothing left
    assert store.filter_resumable(df, "part", "ts").count() == 0
