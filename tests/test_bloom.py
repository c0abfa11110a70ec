"""Bloom-filter membership: no false negatives, FP rate, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.bloom import bloom_build, bloom_probe


def _docs(spark, n, prefix="doc"):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{prefix} text number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_no_false_negatives_and_bounded_false_positives(spark):
    hist = _docs(spark, 400)
    bloom = bloom_build(hist, "text", n_longs=1024, k=4)
    # probe the history itself + 400 unseen docs
    probe = _docs(spark, 800)
    got = {
        r["doc_id"]: r["maybe_seen"]
        for r in bloom_probe(probe, bloom, "text", n_longs=1024, k=4).collect()
    }
    assert len(got) == 800
    # every historical doc MUST hit (no false negatives)
    assert all(got[i] == 1 for i in range(400))
    # unseen docs mostly miss: 400 keys in 64512 bits ≈ 2.4% expected FP
    fps = sum(got[i] for i in range(400, 800))
    assert fps < 40, f"false-positive rate implausibly high: {fps}/400"


def test_definitive_new_admits_without_join(spark):
    hist = _docs(spark, 100)
    bloom = bloom_build(hist, "text")
    new = _docs(spark, 50, prefix="fresh")
    got = bloom_probe(new, bloom, "text").collect()
    # the admission contract: maybe_seen=0 rows are certainly not in history
    hist_texts = {r["text"] for r in hist.collect()}
    new_rows = {r["doc_id"] for r in got if r["maybe_seen"] == 0}
    for r in new.collect():
        if r["doc_id"] in new_rows:
            assert r["text"] not in hist_texts


def test_filter_words_deterministic_across_partitionings(spark):
    h1 = bloom_build(_docs(spark, 300).repartition(1), "text").collect()
    h16 = bloom_build(_docs(spark, 300).repartition(16), "text").collect()
    assert sorted(map(tuple, h1)) == sorted(map(tuple, h16))
    # no word ever sets bit 63 (sign bit) — 63-bit words by construction
    assert all(r["bits"] >= 0 for r in h1)


def test_probe_plan_broadcasts_filter(spark):
    import re

    hist = _docs(spark, 200)
    bloom = bloom_build(hist, "text")
    out = bloom_probe(_docs(spark, 200), bloom, "text")
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert "CartesianProduct" not in plan
