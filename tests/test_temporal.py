"""Point-in-interval join (bucketed) and multi-resolution time rollups."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from transmog_spark.operators.temporal import interval_join, time_rollup


def _ts(h, m=0, s=0):
    return datetime.datetime(2024, 3, 1, h, m, s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            ("u1", 1, _ts(10, 30)),
            ("u1", 2, _ts(13, 0)),   # inside the long interval only
            ("u1", 3, _ts(23, 59)),  # inside nothing
            ("u2", 4, _ts(10, 30)),  # same ts, different key
        ],
        "user string, pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", _ts(10), _ts(11), "a"),        # 1-hour
            ("u1", _ts(9), _ts(20), "b"),         # spans 11 buckets
            ("u1", _ts(10, 30), _ts(10, 30), "c"),  # degenerate point-interval
            ("u1", _ts(15), _ts(14), "broken"),   # end < start: matches nothing
            ("u2", _ts(10), _ts(11), "d"),
        ],
        "user string, start_ts timestamp, end_ts timestamp, tag string",
    )
    return points, intervals


def test_interval_join_containment(frames):
    points, intervals = frames
    out = interval_join(points, intervals, "user")
    got = sorted((r.pid, r.tag) for r in out.collect())
    assert got == [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (4, "d")]


def test_interval_join_no_duplicates_across_buckets(frames):
    """An interval spanning many buckets must still match a point once."""
    points, intervals = frames
    out = interval_join(points, intervals, "user", bucket_seconds=60)
    pairs = [(r.pid, r.tag) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    assert sorted(pairs) == [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (4, "d")]


def test_interval_join_matches_naive_range_join(spark, sf_dir):
    """Bucketed plan ≡ the naive BETWEEN join on real events/sessions."""
    from transmog_spark.operators.windows import sessionize

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = sessionize(e, "user_id", ["ts", "event_id"], gap_seconds=1800.0)
    iv = s.groupBy("user_id", "session_index").agg(
        F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts")
    )
    pts = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    fast = interval_join(pts, iv, "user_id", payload_cols=["session_index"])
    naive = pts.join(iv, "user_id").where(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts"))
    ).select("event_id", "user_id", "ts", "session_index")
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b and a  # equal and non-empty


def test_time_rollup_day_equals_sum_of_hours(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = time_rollup(e, "event_type", resolutions=("hour", "day")).cache()
    hours = out.where(F.col("resolution") == "hour")
    days = out.where(F.col("resolution") == "day")
    # day level re-derived from the hour level must equal the emitted days
    rederived = hours.groupBy(
        F.date_trunc("day", "bucket_ts").alias("bucket_ts"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("value_sum"), 4).alias("value_sum"),
    )
    a = sorted(
        (str(r.bucket_ts), r.event_type, r.n_events, round(r.value_sum, 4))
        for r in days.collect()
    )
    b = sorted(
        (str(r.bucket_ts), r.event_type, r.n_events, round(r.value_sum, 4))
        for r in rederived.collect()
    )
    assert a == b
    # totals match the raw table
    assert hours.agg(F.sum("n_events")).collect()[0][0] == e.count()

# ---------------------------------------------------------------------------
# scd2_intervals
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def changelog(spark):
    from transmog_spark.operators.temporal import scd2_intervals

    rows = [
        (1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "b"), (1, 50, "a"),
        (2, 5, None), (2, 7, None), (2, 9, "x"),
        (3, 1, "only"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, state string")
    return df, scd2_intervals


def test_scd2_collapse_and_chain(changelog):
    df, scd2_intervals = changelog
    out = scd2_intervals(df, "user_id", tracked=["state"])
    got = sorted(map(tuple, out.collect()), key=lambda t: (t[0], t[2]))
    assert got == [
        (1, "a", 10, 30), (1, "b", 30, 50), (1, "a", 50, None),
        (2, None, 5, 9), (2, "x", 9, None),
        (3, "only", 1, None),
    ]
    # intervals tile each entity's timeline: next valid_from == valid_to
    by_user = {}
    for u, _s, vf, vt in got:
        by_user.setdefault(u, []).append((vf, vt))
    for runs in by_user.values():
        runs.sort()
        for (_pf, prev_to), (nxt_from, _nt) in zip(runs, runs[1:]):
            assert prev_to == nxt_from


def test_scd2_no_collapse_keeps_every_change(changelog):
    df, scd2_intervals = changelog
    out = scd2_intervals(df, "user_id", tracked=["state"], collapse=False)
    assert out.count() == df.count()


def test_scd2_single_window_spine(changelog):
    """Collapse lag + closing lead share ONE Exchange + ONE Sort."""
    df, scd2_intervals = changelog
    plan = scd2_intervals(df, "user_id", tracked=["state"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("Sort ") == 1


def test_scd2_point_in_time_lookup_roundtrip(changelog):
    """interval_join over the built intervals reproduces as-of semantics."""
    df, scd2_intervals = changelog
    from transmog_spark.operators.temporal import interval_join

    iv = scd2_intervals(df, "user_id", tracked=["state"]).withColumn(
        "start_ts", F.timestamp_seconds(F.col("valid_from"))
    ).withColumn(
        # half-open [from, to): subtract 1s from the inclusive-join end
        "end_ts",
        F.timestamp_seconds(F.coalesce(F.col("valid_to") - 1, F.lit(10**9))),
    )
    pts = df.sparkSession.createDataFrame(
        [(1, 35), (1, 50), (2, 6), (3, 0)], "user_id long, qts long"
    ).withColumn("ts", F.timestamp_seconds(F.col("qts")))
    out = interval_join(pts, iv, "user_id", payload_cols=["state"])
    got = {(r.user_id, r.qts): r.state for r in out.collect()}
    assert got == {(1, 35): "b", (1, 50): "a", (2, 6): None}


def test_scd2_requires_tracked(changelog):
    df, scd2_intervals = changelog
    with pytest.raises(ValueError):
        scd2_intervals(df.select("user_id", "ts"), "user_id")
