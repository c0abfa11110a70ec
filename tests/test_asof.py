"""As-of join correctness vs pandas.merge_asof (the oracle the north rule names).

Covers: inclusive (<=) and strict (<) matching, left-outer semantics,
tolerance, salt invariance (salted plan ≡ unsalted plan), and the zero
temporal-leakage property on skewed synthetic data.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from transmog_spark.operators.asof import asof_join, asof_join_pandas, leakage_violations
from transmog_spark.sources import synth


@pytest.fixture(scope="module")
def asof_frames(spark):
    """Deterministic left/right frames with ties, gaps and no-match keys."""
    import random

    rng = random.Random(7)
    left_rows = [
        (f"k{rng.randrange(6)}", float(rng.randrange(100)), i) for i in range(300)
    ]
    right_rows = [
        (f"k{rng.randrange(8)}", float(rng.randrange(100)), float(i)) for i in range(200)
    ]
    # inject exact-tie timestamps to pin <= vs < behavior
    left_rows += [("k0", 50.0, 9001), ("k1", 50.0, 9002)]
    right_rows += [("k0", 50.0, 777.0), ("k1", 50.0, 778.0)]
    left = spark.createDataFrame(left_rows, "k string, ts double, qid long")
    right = spark.createDataFrame(right_rows, "k string, ts double, v double")
    return left, right


def _pandas_asof(left, right, strict):
    lp = left.toPandas().sort_values("ts", kind="mergesort")
    rp = right.toPandas().sort_values("ts", kind="mergesort")
    out = pd.merge_asof(
        lp, rp, on="ts", by="k", allow_exact_matches=not strict
    )
    return sorted(
        (r.k, r.ts, r.qid, None if pd.isna(r.v) else r.v) for r in out.itertuples()
    )


def _spark_asof(left, right, strict, **kw):
    out = asof_join(left, right, on="k", value_cols=["v"], strict=strict, **kw)
    return sorted((r.k, r.ts, r.qid, r.v) for r in out.collect())


@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_pandas(asof_frames, strict):
    left, right = asof_frames
    assert _spark_asof(left, right, strict) == _pandas_asof(left, right, strict)


@pytest.mark.parametrize("strict", [False, True])
def test_salted_asof_identical_to_unsalted(asof_frames, strict):
    left, right = asof_frames
    assert _spark_asof(left, right, strict, salt_buckets=4) == _spark_asof(
        left, right, strict
    )


def test_asof_applyinpandas_variant_agrees(asof_frames):
    left, right = asof_frames
    got = sorted(
        (r.k, r.ts, r.qid, r.v)
        for r in asof_join_pandas(left, right, on="k", value_cols=["v"]).collect()
    )
    assert got == _pandas_asof(left, right, strict=False)


def test_asof_tolerance_masks_stale_matches(spark):
    left = spark.createDataFrame([("a", 100.0, 1)], "k string, ts double, qid long")
    right = spark.createDataFrame(
        [("a", 10.0, 5.0), ("a", 95.0, 7.0)], "k string, ts double, v double"
    )
    # within 10s: match at ts=95 kept; tolerance 3s: masked to NULL
    ok = asof_join(left, right, on="k", value_cols=["v"], tolerance_seconds=10).collect()
    assert ok[0].v == 7.0
    masked = asof_join(left, right, on="k", value_cols=["v"], tolerance_seconds=3).collect()
    assert masked[0].v is None


def test_left_outer_unmatched_keys_keep_nulls(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="k", value_cols=["v"])
    assert out.count() == left.count()


@pytest.mark.parametrize("strict", [False, True])
def test_zero_temporal_leakage_on_skewed_synth(spark, strict):
    """North-rule invariant: matched feature ts never exceeds the query ts,
    on the skewed synthetic tables (hot source ~50% of rows), salted."""
    q = synth.query_points(spark, 800)
    f = synth.feature_events(spark, 800)
    joined = asof_join(
        q,
        f.select("doc_id", "ts", "feature_v"),
        on="doc_id",
        value_cols=["feature_v"],
        strict=strict,
        salt_buckets=4,
        matched_ts_col="feature_ts",
    )
    assert leakage_violations(joined, "ts", "feature_ts", strict=strict) == 0
    assert joined.count() == q.count()


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 10.0), ("b", 1, 10.0)], "k1 string, k2 int, ts double"
    )
    right = spark.createDataFrame(
        [("a", 1, 5.0, 1.0), ("a", 2, 5.0, 2.0), ("b", 1, 20.0, 3.0)],
        "k1 string, k2 int, ts double, v double",
    )
    out = asof_join(left, right, on=["k1", "k2"], value_cols=["v"]).collect()
    got = {(r.k1, r.k2): r.v for r in out}
    assert got == {("a", 1): 1.0, ("a", 2): 2.0, ("b", 1): None}


def test_asof_join_multi_independent_tables(spark):
    from transmog_spark.operators.asof import asof_audit, asof_join_multi

    left = spark.createDataFrame(
        [("u1", 10.0), ("u1", 20.0), ("u2", 5.0)], "user string, ts double"
    )
    clicks = spark.createDataFrame(
        [("u1", 9.0, 1.0), ("u1", 15.0, 2.0)], "user string, ts double, v double"
    )
    views = spark.createDataFrame(
        [("u1", 19.5, 7.0), ("u2", 1.0, 8.0)], "user string, ts double, v double"
    )
    out = asof_join_multi(
        left, [("click", clicks), ("view", views)], on="user",
        left_ts="ts", right_ts="ts", matched_ts=True,
    )
    rows = {(r["user"], r["ts"]): r for r in out.collect()}
    assert rows[("u1", 10.0)]["click_v"] == 1.0
    assert rows[("u1", 10.0)]["view_v"] is None  # view at 19.5 is the future
    assert rows[("u1", 20.0)]["click_v"] == 2.0
    assert rows[("u1", 20.0)]["view_v"] == 7.0
    assert rows[("u2", 5.0)]["click_v"] is None
    assert rows[("u2", 5.0)]["view_v"] == 8.0
    # matched timestamps never exceed the query timestamp (zero leakage)
    for r in rows.values():
        for c in ("click_matched_ts", "view_matched_ts"):
            assert r[c] is None or r[c] <= r["ts"]


def test_asof_audit_counts_and_flags(spark):
    from pyspark.sql import functions as F

    from transmog_spark.operators.asof import asof_audit, asof_join

    left = spark.createDataFrame(
        [("u1", 10.0), ("u1", 20.0), ("u2", 5.0)], "user string, ts double"
    )
    right = spark.createDataFrame(
        [("u1", 9.0, 1.0)], "user string, ts double, v double"
    )
    joined = asof_join(
        left, right, on="user", value_cols=["v"], matched_ts_col="mts"
    )
    audit = {
        r["user"]: r
        for r in asof_audit(joined, "user", "ts", "mts").collect()
    }
    assert audit["u1"]["n_rows"] == 2 and audit["u1"]["n_matched"] == 2
    assert audit["u1"]["n_violations"] == 0
    assert audit["u2"]["n_rows"] == 1 and audit["u2"]["n_matched"] == 0
    assert audit["u2"]["n_violations"] == 0
    # a hand-built leaky frame IS flagged (the audit is not a tautology)
    leaky = spark.createDataFrame(
        [("u3", 10.0, 11.0)], "user string, ts double, mts double"
    )
    bad = asof_audit(leaky, "user", "ts", "mts").collect()[0]
    assert bad["n_violations"] == 1


def _pandas_asof_fwd(left, right, strict):
    lp = left.toPandas().sort_values("ts", kind="mergesort")
    rp = right.toPandas().sort_values("ts", kind="mergesort")
    out = pd.merge_asof(
        lp, rp, on="ts", by="k", allow_exact_matches=not strict,
        direction="forward",
    )
    return sorted(
        (r.k, r.ts, r.qid, None if pd.isna(r.v) else r.v) for r in out.itertuples()
    )


@pytest.mark.parametrize("strict", [False, True])
def test_asof_forward_matches_pandas(asof_frames, strict):
    left, right = asof_frames
    # unique (k, ts) on the feature side: on forward ties merge_asof keeps
    # the first row in sort order while the engine resolves to max(v) —
    # both conventions coincide once ties are pre-aggregated (the shape
    # every registered query uses)
    right = right.groupBy("k", "ts").agg(F.max("v").alias("v"))
    got = _spark_asof(left, right, strict, direction="forward")
    assert got == _pandas_asof_fwd(left, right, strict)


@pytest.mark.parametrize("strict", [False, True])
def test_salted_asof_forward_identical_to_unsalted(asof_frames, strict):
    left, right = asof_frames
    assert _spark_asof(left, right, strict, direction="forward") == _spark_asof(
        left, right, strict, direction="forward", salt_buckets=8
    )


def test_asof_forward_tolerance_masks_distant_matches(spark):
    left = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 90.0, 2)], "k string, ts double, qid long"
    )
    right = spark.createDataFrame(
        [("a", 12.0, 5.0), ("a", 200.0, 7.0)], "k string, ts double, v double"
    )
    out = {
        r.qid: r.v
        for r in asof_join(
            left, right, on="k", value_cols=["v"],
            direction="forward", tolerance_seconds=20.0,
        ).collect()
    }
    assert out[1] == 5.0   # 12 - 10 = 2s ahead, inside tolerance
    assert out[2] is None  # 200 - 90 = 110s ahead, masked


def _pandas_asof_nearest(left, right):
    lp = left.toPandas().sort_values("ts", kind="mergesort")
    rp = right.toPandas().sort_values("ts", kind="mergesort")
    out = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    return sorted(
        (r.k, r.ts, r.qid, None if pd.isna(r.v) else r.v) for r in out.itertuples()
    )


def test_asof_nearest_matches_pandas(asof_frames):
    left, right = asof_frames
    # tie-free feature frames (pre-aggregated), the registered-query shape;
    # equidistant backward/forward ties resolve BACKWARD on both sides
    # (verified pandas convention)
    right = right.groupBy("k", "ts").agg(F.max("v").alias("v"))
    got = _spark_asof(left, right, False, direction="nearest")
    assert got == _pandas_asof_nearest(left, right)


def test_salted_asof_nearest_identical_to_unsalted(asof_frames):
    left, right = asof_frames
    assert _spark_asof(left, right, False, direction="nearest") == _spark_asof(
        left, right, False, direction="nearest", salt_buckets=8
    )


def test_asof_nearest_tolerance_masks_each_side(spark):
    left = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 90.0, 2), ("a", 300.0, 3)],
        "k string, ts double, qid long",
    )
    right = spark.createDataFrame(
        [("a", 13.0, 5.0), ("a", 95.0, 7.0)], "k string, ts double, v double"
    )
    out = {
        r.qid: r.v
        for r in asof_join(
            left, right, on="k", value_cols=["v"],
            direction="nearest", tolerance_seconds=20.0,
        ).collect()
    }
    assert out[1] == 5.0   # 3s forward gap beats 13s... both fwd; closest is 13.0
    assert out[2] == 7.0   # 5s forward within tolerance
    assert out[3] is None  # 205s from nearest, masked


def test_asof_nearest_exact_match_resolves_backward(spark):
    left = spark.createDataFrame([("a", 50.0, 1)], "k string, ts double, qid long")
    right = spark.createDataFrame(
        [("a", 50.0, 1.0), ("a", 51.0, 2.0)], "k string, ts double, v double"
    )
    out = asof_join(
        left, right, on="k", value_cols=["v"], direction="nearest",
        matched_ts_col="mts",
    ).collect()[0]
    assert out.v == 1.0 and out.mts == 50.0


def test_asof_nearest_strict_raises(spark):
    left = spark.createDataFrame([("a", 1.0, 1)], "k string, ts double, qid long")
    with pytest.raises(ValueError, match="nearest"):
        asof_join(left, left, on="k", direction="nearest", strict=True)
