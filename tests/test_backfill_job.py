"""End-to-end test of the spark-submit backfill job: run, resume, idempotence."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/jobs")


@pytest.fixture(scope="module")
def job_paths(tmp_path_factory):
    base = tmp_path_factory.mktemp("backfill")
    return str(base / "out"), str(base / "ckpt")


N = 400


def _run(out, ckpt, **over):
    import backfill_features as job

    argv = [
        "--synth-docs", str(N),
        "--output", out,
        "--checkpoint", ckpt,
        "--gap-seconds", "21600",
    ]
    for k, v in over.items():
        argv += [f"--{k}", str(v)]
    assert job.main(argv) == 0


def test_backfill_then_resume_is_idempotent(spark, job_paths):
    out, ckpt = job_paths
    _run(out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == N  # one PIT row per sequence row
    assert "feature_ts" in first.columns and "session_index" in first.columns
    # zero temporal leakage in the written output
    assert first.where(
        F.col("feature_ts").isNotNull() & (F.col("feature_ts") > F.col("ts"))
    ).count() == 0

    # second run: every partition is at its watermark -> no new rows appended
    _run(out, ckpt)
    assert spark.read.parquet(out).count() == N


def test_crash_between_write_and_commit_does_not_duplicate(spark, tmp_path):
    """Simulate a crash AFTER the data writes but BEFORE any watermark
    commit: wipe the checkpoint and re-run. Dynamic partition overwrite must
    replace the partial output, not append to it."""
    import shutil

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(out, ckpt)
    n1 = spark.read.parquet(out).count()
    shutil.rmtree(ckpt)  # lose all watermarks == crash before first commit
    _run(out, ckpt)  # full re-run of every slice
    assert spark.read.parquet(out).count() == n1  # replaced, not doubled


def test_grown_input_cannot_clobber_committed_slice(spark, tmp_path):
    """Resume safety: if the input table gained rows after a slice committed,
    a re-run must SKIP the committed slice entirely — ts-filter + partition
    overwrite would rewrite it with only the tail rows."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(out, ckpt)
    before = sorted(
        map(tuple, spark.read.parquet(out).where(F.col("source") == "src_hot")
            .select("doc_id", "ts").collect())
    )
    assert before
    # same seed, larger table: every original row still present + new ones
    import backfill_features as job

    argv = [
        "--synth-docs", str(N * 2),
        "--output", out,
        "--checkpoint", ckpt,
        "--gap-seconds", "21600",
    ]
    assert job.main(argv) == 0
    after = sorted(
        map(tuple, spark.read.parquet(out).where(F.col("source") == "src_hot")
            .select("doc_id", "ts").collect())
    )
    assert after == before  # committed slice untouched, not truncated


def test_backfill_salted_matches_unsalted(spark, tmp_path):
    out_a, ckpt_a = str(tmp_path / "a_out"), str(tmp_path / "a_ckpt")
    out_b, ckpt_b = str(tmp_path / "b_out"), str(tmp_path / "b_ckpt")
    _run(out_a, ckpt_a)
    _run(out_b, ckpt_b, **{"salt-buckets": 4})
    cols = ["doc_id", "ts", "feature_v", "session_index", "n_tok_lag1"]
    a = sorted(map(tuple, spark.read.parquet(out_a).select(cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(out_b).select(cols).collect()))
    assert a == b
