"""e2e for jobs/profile_corpus.py: every profile section materializes with
the expected shape and internally consistent numbers."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from jobs.profile_corpus import main as profile_main


def test_profile_job_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "profile")
    rc = profile_main(
        [
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", out,
            "--shuffle-partitions", "8",
            "--cms-width", "64",
            "--cms-threshold", "100",
        ]
    )
    assert rc == 0

    with open(os.path.join(out, "_PROFILE.json")) as fh:
        summary = json.load(fh)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    assert summary["n_docs"] == n_docs
    assert summary["sum_tokens"] > 0
    assert summary["distinct_tokens_hll"] > 0

    stats = spark.read.parquet(os.path.join(out, "source_stats"))
    assert stats.agg({"n_docs": "sum"}).collect()[0][0] == n_docs
    n_sources = docs.select("source").distinct().count()
    assert stats.count() == n_sources

    tq = spark.read.parquet(os.path.join(out, "token_quantiles")).collect()
    assert len(tq) == 3 * n_sources
    # sketch-only section: verify bounds against exactly computed quantiles
    import math
    from collections import defaultdict

    by_source = defaultdict(list)
    for row in docs.selectExpr(
        "source", "size(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS n"
    ).collect():
        by_source[row["source"]].append(row["n"])
    for r in tq:
        assert 0 <= r["est_lo"] <= r["est_hi"]
        vals = sorted(by_source[r["source"]])
        exact = vals[math.ceil(r["q"] * len(vals)) - 1]
        assert r["est_lo"] <= exact <= r["est_hi"], (r, exact)

    lang = spark.read.parquet(os.path.join(out, "lang_mix"))
    assert lang.agg({"n_docs": "sum"}).collect()[0][0] == n_docs

    qual = spark.read.parquet(os.path.join(out, "quality")).collect()
    assert len(qual) == n_sources
    for r in qual:
        assert 0.0 <= r["low_quality_rate"] <= 1.0

    heavy = spark.read.parquet(os.path.join(out, "heavy_terms")).collect()
    for r in heavy:
        assert r["overcount"] >= 0  # CMS never undercounts

    mix = spark.read.parquet(os.path.join(out, "mixture_weights")).collect()
    assert len(mix) == n_sources
    assert abs(sum(r["p_nat"] for r in mix) - 1.0) < 1e-4
    assert abs(sum(r["q_target"] for r in mix) - 1.0) < 1e-4
    # the default alpha=0.3 preserves expected corpus size
    assert abs(sum(r["n_docs"] * r["weight"] for r in mix) - n_docs) < 1.0

    drift = spark.read.parquet(os.path.join(out, "vocab_drift")).collect()
    assert len(drift) == n_sources
    assert sum(r["n_tokens"] for r in drift) == summary["sum_tokens"]
    for r in drift:
        # KL >= 0 up to the 1e-4 ln-grid rounding of individual terms
        assert r["kl"] >= -1e-3, r
    # opt-in sections absent by default
    assert not os.path.exists(os.path.join(out, "dedup_stats"))


def test_profile_job_dedup_report_sections(spark, sf_dir, tmp_path):
    out = str(tmp_path / "profile_dedup")
    rc = profile_main(
        [
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", out,
            "--shuffle-partitions", "8",
            "--dedup-report",
            "--dedup-threshold", "0.2",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "_PROFILE.json")) as fh:
        summary = json.load(fh)
    assert "dedup_stats" in summary["sections"]
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    stats = spark.read.parquet(os.path.join(out, "dedup_stats")).collect()
    assert sum(r["n_docs"] for r in stats) == n_docs
    for r in stats:
        assert 0 <= r["n_dropped"] <= r["n_clustered"] <= r["n_docs"]
        assert 0.0 <= r["drop_rate"] <= 1.0

    hist = spark.read.parquet(os.path.join(out, "dup_size_hist")).collect()
    # every cluster has >= 2 members by construction, and the histogram's
    # member total equals the corpus-wide clustered-doc count
    assert all(r["cluster_size"] >= 2 for r in hist)
    assert sum(r["cluster_size"] * r["n_clusters"] for r in hist) == sum(
        r["n_clustered"] for r in stats
    )


def test_profile_job_entropy_and_diversity_sections(spark, sf_dir, tmp_path):
    out = str(tmp_path / "profile_ent")
    rc = profile_main(
        [
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", out,
            "--shuffle-partitions", "8",
            "--entropy",
            "--diversity",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "_PROFILE.json")) as fh:
        summary = json.load(fh)
    assert "entropy" in summary["sections"]
    assert "ngram_diversity" in summary["sections"]

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_sources = docs.select("source").distinct().count()

    ent = spark.read.parquet(os.path.join(out, "entropy")).collect()
    assert len(ent) == n_sources
    for r in ent:
        assert r["mean_char_entropy"] > 0.0
        assert r["mean_token_entropy"] > 0.0
        assert 0.0 <= r["low_entropy_rate"] <= 1.0

    div = spark.read.parquet(os.path.join(out, "ngram_diversity")).collect()
    assert len(div) == n_sources * 3
    for r in div:
        assert 0.0 < r["distinct_ratio"] <= 1.0
        assert r["distinct_grams"] <= r["total_grams"]
