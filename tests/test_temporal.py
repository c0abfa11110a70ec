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
