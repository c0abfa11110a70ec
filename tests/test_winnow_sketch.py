"""Winnowing fingerprints (guarantee + density) and CMS heavy hitters
(overestimate-only + exact recall)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_winnow_shared_run_guarantees_shared_fingerprint(spark):
    """Schleimer et al. §3: any shared substring of >= k + w - 1 tokens
    yields at least one SHARED fingerprint."""
    from transmog_spark.operators.winnow import winnow_fingerprints

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = k + w - 1
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight {shared} nine ten eleven twelve"),
        (3, "completely different words with no common run at all here"),
    ]
    fps = winnow_fingerprints(
        spark.createDataFrame(rows, "doc_id long, text string"),
        k=k, w=w,
    )
    by_doc = {
        r["doc_id"]: set(x["fp_hash"] for x in r["fp"])
        for r in fps.groupBy("doc_id")
        .agg(F.collect_list(F.struct("fp_hash")).alias("fp"))
        .collect()
    }
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])


def test_winnow_density_and_short_docs(spark):
    from transmog_spark.operators.winnow import winnow_fingerprints

    k, w = 3, 4
    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),  # all-distinct grams
        (2, "a b c"),       # exactly k tokens -> 1 gram -> 1 fingerprint
        (3, "a b"),         # < k tokens -> no grams -> no fingerprints
    ]
    fps = winnow_fingerprints(
        spark.createDataFrame(rows, "doc_id long, text string"), k=k, w=w
    )
    per = {r["doc_id"]: r["n"] for r in fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n_grams = 100 - k + 1
    # distinct random-ish hashes: expected density 2/(w+1); allow wide band
    # but pin that selection actually thins the stream
    assert n_grams * 0.1 <= per[1] <= n_grams * 0.75
    assert per[2] == 1
    assert 3 not in per


def test_winnow_pairs_finds_planted_neardups(spark, sf_dir):
    import os

    from transmog_spark.operators.winnow import winnow_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = winnow_pairs(docs, k=5, w=4, min_shared=2, max_bucket=500)
    rows = pairs.collect()
    assert len(rows) > 0
    assert all(r["id_a"] < r["id_b"] and r["shared"] >= 2 for r in rows)


def test_hll_distinct_accuracy_and_bounded_state(spark, sf_dir):
    """HLL standard error is 1.04/sqrt(m) ≈ 1.6% at p=12; pin a 6%
    band (≈4σ) on the corpus vocabulary, and pin that the register table
    is bounded by m regardless of corpus size."""
    import os

    from transmog_spark.operators.sketch import hll_distinct, hll_registers

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    row = hll_distinct(docs, p=12).collect()[0]
    assert row["m"] == 4096
    assert row["exact_distinct"] > 0
    assert abs(row["rel_err_pct"]) < 6.0
    assert abs(row["hll_est"] - row["exact_distinct"]) <= 0.06 * row["exact_distinct"]
    regs = hll_registers(docs, p=12)
    assert regs.count() == row["n_present"] <= 4096
    # registers are rho values: 1..(60-p)+1
    bad = regs.where((F.col("reg") < 1) | (F.col("reg") > 49)).count()
    assert bad == 0


def test_hll_small_range_linear_counting(spark):
    """A tiny vocabulary lands in the linear-counting branch and the
    estimate is near-exact (few occupied registers, no collisions)."""
    from transmog_spark.operators.sketch import hll_distinct

    rows = [(i, f"w{i % 17} filler common") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = hll_distinct(df, p=12).collect()[0]
    assert row["exact_distinct"] == 19
    assert abs(row["hll_est"] - 19.0) < 0.5


def test_cms_overestimates_only_and_full_recall(spark, sf_dir):
    import os

    from transmog_spark.operators.sketch import cms_heavy_hitters, cms_sketch

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    depth, width, thr = 4, 32, 100
    hh = cms_heavy_hitters(
        docs, depth=depth, width=width, threshold=thr
    ).collect()
    assert len(hh) > 0
    # the CMS invariant: estimates never undercount
    assert all(r["overcount"] >= 0 for r in hh)
    # exact recall: every truly-hot term must be reported (no false negatives)
    from transmog_spark.operators.sketch import _term_counts

    hot = {
        r["term"]
        for r in _term_counts(docs, "doc_id", "text")
        .where(F.col("exact") >= thr)
        .collect()
    }
    assert hot <= {r["term"] for r in hh}
    # bounded state regardless of corpus size
    assert cms_sketch(docs, depth=depth, width=width).count() <= depth * width


def test_hll_empty_corpus_degrades_to_zero(spark):
    from transmog_spark.operators.sketch import hll_distinct

    df = spark.createDataFrame([], "doc_id long, text string")
    row = hll_distinct(df, p=12).collect()[0]
    assert row["exact_distinct"] == 0
    assert row["hll_est"] == 0.0
    assert row["rel_err_pct"] is None


def test_hdr_bucket_exactness_and_merge(spark):
    """Every value decodes into its bucket's [lo, hi] range; width/lo
    <= 1/k; histograms merge by bucket-sum (sketch(A+B) == merge)."""
    from pyspark.sql import functions as F

    from transmog_spark.operators.sketch import hdr_bucket_bounds, hdr_histogram

    vals = list(range(0, 130)) + [255, 256, 257, 1000, 65535, 10**9, 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    k = 32
    hist = hdr_histogram(df, "v", k=k)
    lo, hi = hdr_bucket_bounds(k)
    dec = hist.select("bucket", "cnt", lo.alias("lo"), hi.alias("hi")).collect()
    by_bucket = {r.bucket: (r.lo, r.hi, r.cnt) for r in dec}
    assert sum(c for _, _, c in by_bucket.values()) == len(vals)
    # recompute each value's bucket in python and check containment
    b = k.bit_length() - 1
    for v in vals:
        u = v + 1
        s = max(0, u.bit_length() - 1 - b)
        idx = s * k + (u >> s)
        blo, bhi, _ = by_bucket[idx]
        assert blo <= v <= bhi, (v, idx, blo, bhi)
        assert (bhi - blo) <= max(1, (blo + 1)) / k + 1  # rel width <= ~1/k
    # mergeability: two halves summed == whole
    a = hdr_histogram(df.where(F.col("v") < 100), "v", k=k)
    c = hdr_histogram(df.where(F.col("v") >= 100), "v", k=k)
    merged = a.unionByName(c).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    got = {r.bucket: r.cnt for r in merged.collect()}
    assert got == {bkt: c for bkt, (_, _, c) in by_bucket.items()}


def test_hdr_value_quantiles_containment(spark):
    import random

    from transmog_spark.operators.sketch import hdr_value_quantiles

    rng = random.Random(7)
    rows = [(f"s{i % 3}", rng.randrange(1, 50_000)) for i in range(3000)]
    df = spark.createDataFrame(rows, "source string, n long")
    out = hdr_value_quantiles(
        df, "n", [0.5, 0.9, 0.99], k=32, group_by=["source"]
    ).collect()
    assert len(out) == 9
    for r in out:
        assert r.contained, r
        assert r.est_lo <= r.exact_q <= r.est_hi
        assert (r.est_hi - r.est_lo) / max(1, r.est_lo) <= 1 / 32 + 1e-9
    # exact_q cross-check for one group in pure python (lower quantile)
    s0 = sorted(n for s, n in rows if s == "s0")
    import math

    for r in out:
        if r.source == "s0":
            assert r.exact_q == s0[math.ceil(r.q * len(s0)) - 1]


def test_hll_low_p_registers_do_not_wrap(spark, sf_dir):
    """Regression: scale must track p (61 - p). At p=8 the max register is
    53; a hardcoded 49 made shiftleft(1, 49-53) wrap mod 64 in the JVM
    and silently corrupt the estimate."""
    from transmog_spark.operators.sketch import hll_distinct

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = hll_distinct(docs, p=8).collect()[0]
    exact = row["exact_distinct"]
    # standard error ~ 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
    assert exact > 0 and abs(row["hll_est"] - exact) / exact < 0.26, row


def test_hdr_null_values_are_dropped(spark):
    """NULL values must not form a NULL bucket: Spark sorts NULLs first
    and DuckDB last, so a NULL bucket would bias quantiles in opposite
    directions per engine. The sketch drops them; totals count non-null
    rows only, on both the sketch and the exact-rider path."""
    from transmog_spark.operators.sketch import (
        hdr_histogram,
        hdr_quantiles,
        hdr_value_quantiles,
    )

    rows = [(1,), (2,), (3,), (None,), (None,)]
    df = spark.createDataFrame(rows, "v long")
    hist = hdr_histogram(df, "v", k=32)
    assert sum(r.cnt for r in hist.collect()) == 3
    med = hdr_quantiles(hist, [0.5], k=32).collect()[0]
    assert med.est_lo <= 2 <= med.est_hi
    full = hdr_value_quantiles(df, "v", [0.5], k=32).collect()[0]
    assert full.exact_q == 2 and full.contained
