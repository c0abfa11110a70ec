"""The north-rule launch path, executed for real: ``spark-submit
--py-files transmog_spark.zip jobs/backfill_features.py``.

The job script is copied to a neutral temp directory before submission,
so every ``transmog_spark`` import inside the driver and the executors
must resolve from the shipped zip — exactly the cluster deployment
contract (no repo checkout on the workers).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_backfill(tmp_path, spark):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "transmog_spark.zip"))
    job = tmp_path / "backfill_features.py"
    shutil.copy(os.path.join(REPO, "jobs", "backfill_features.py"), job)

    out_dir = tmp_path / "pit_out"
    ckpt_dir = tmp_path / "pit_ckpt"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(job),
            "--synth-docs", "300",
            "--synth-sources", "2",
            "--output", str(out_dir),
            "--checkpoint", str(ckpt_dir),
        ],
        cwd=str(tmp_path),  # neutral cwd: the repo is NOT importable from here
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "done" in proc.stdout

    out = spark.read.parquet(str(out_dir))
    assert out.count() > 0
    got_cols = set(out.columns)
    for c in ("doc_id", "ts", "session_index", "n_tok_lag1", "feature_ts"):
        assert c in got_cols, f"missing {c} in {sorted(got_cols)}"
    # per-slice lineage was committed
    lineage = spark.read.parquet(str(ckpt_dir))
    assert lineage.count() > 0


def test_pyfiles_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
    import zipfile

    names = zipfile.ZipFile(a).namelist()
    assert "transmog_spark/operators/packing.py" in names
    assert not any(n.endswith(".pyc") or "__pycache__" in n for n in names)
