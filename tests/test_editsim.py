"""Edit-distance similarity join: blocking completeness, exact verify."""

from __future__ import annotations

import itertools
import random

import pytest


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _brute(rows, d):
    return sorted(
        (a, b, _lev(ka, kb))
        for (a, ka), (b, kb) in itertools.combinations(
            [(i, k) for i, k in rows if k is not None], 2
        )
        if _lev(ka, kb) <= d
    )


def test_fuzzy_pairs_exact_vs_brute_force(spark):
    from transmog_spark.operators.editsim import fuzzy_pairs

    rows = [
        (1, "hello world"),
        (2, "hello worlds"),  # dist 1 to 1
        (3, "hullo world"),   # dist 1 to 1, 2 to 2
        (4, "completely other"),
        (5, "hello"),
        (6, "ab"),            # short block
        (7, "abc"),           # dist 1 to 6
        (8, ""),              # empty: dist 2 to 'ab'
        (9, None),            # excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "key"])
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "doc_id", "key", max_dist=2).collect()
    )
    assert got == _brute(rows, 2)


def test_fuzzy_pairs_completeness_seeded_random(spark):
    # PassJoin blocking must find EVERY pair <= d: random short keys over a
    # tiny alphabet (dense near-collisions), seeded for replay
    from transmog_spark.operators.editsim import fuzzy_pairs

    rng = random.Random(42)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 8))))
        for i in range(60)
    ]
    for d in (1, 2):
        df = spark.createDataFrame(rows, ["doc_id", "key"])
        got = sorted(
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs(df, "doc_id", "key", max_dist=d).collect()
        )
        assert got == _brute(rows, d), f"incomplete at d={d}"


def test_fuzzy_pairs_validation_and_cap(spark):
    from transmog_spark.operators.editsim import fuzzy_pairs

    df = spark.createDataFrame([(1, "aa"), (2, "aa"), (3, "aa")], ["doc_id", "key"])
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "doc_id", "key", max_dist=0)
    # max_bucket=1 caps each block to one member -> no candidate survives
    capped = fuzzy_pairs(df, "doc_id", "key", max_dist=1, max_bucket=1).count()
    full = fuzzy_pairs(df, "doc_id", "key", max_dist=1).count()
    assert full == 3 and capped < full


def test_dedupe_fuzzy_keeps_min_id_per_cluster(spark):
    from transmog_spark.operators.editsim import dedupe_fuzzy

    rows = [
        (10, "spark engine"),
        (11, "spark enginee"),   # cluster with 10
        (12, "sparkk enginee"),  # chain: dist 1 to 11, 2 to 10
        (20, "duckdb oracle"),
        (21, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "key"])
    kept = sorted(r.doc_id for r in dedupe_fuzzy(df, "doc_id", "key", max_dist=1).collect())
    # 10-11-12 is one component via the chain; min id 10 survives
    assert kept == [10, 20, 21]
