"""Event-time streaming operators: batch/stream parity, watermark late-data."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from transmog_spark.operators.windows import sessionize
from transmog_spark.streaming.windows import (
    dedupe_stream,
    session_aggregates_stream,
    windowed_counts,
)

T0 = datetime(2024, 1, 1)


def _events(spark):
    rows = [
        ("u1", T0, 1.0),
        ("u1", T0 + timedelta(minutes=2), 2.0),
        ("u1", T0 + timedelta(minutes=90), 5.0),
        ("u2", T0 + timedelta(minutes=1), 3.0),
    ]
    return spark.createDataFrame(rows, "user string, ts timestamp, v double")


def test_windowed_counts_batch(spark):
    out = windowed_counts(
        _events(spark), "ts", window="5 minutes", keys=["user"], agg_cols={"v": "sum"}
    )
    got = {(r.user, r.window_start.isoformat()): (r.n_events, r.v_sum) for r in out.collect()}
    assert got[("u1", "2024-01-01T00:00:00")] == (2, 3.0)
    assert got[("u2", "2024-01-01T00:00:00")] == (1, 3.0)
    assert got[("u1", "2024-01-01T01:30:00")] == (1, 5.0)


def test_session_window_matches_batch_sessionizer(spark):
    df = _events(spark)
    stream_style = session_aggregates_stream(
        df, "user", "ts", gap="30 minutes", agg_cols={"v": "sum"}
    )
    got = {
        (r.user, r.session_start.isoformat()): (r.session_len, r.session_v_sum)
        for r in stream_style.collect()
    }
    # batch sessionizer (gap-lag formulation) same sessions
    batch = sessionize(df, "user", ["ts"], gap_seconds=1800.0)
    agg = batch.groupBy("user", "session_index").agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"), F.sum("v").alias("vs")
    )
    exp = {(r.user, r.s.isoformat()): (r.n, r.vs) for r in agg.collect()}
    assert got == exp


def test_session_window_on_real_stream(spark, tmp_path):
    """Genuine streaming run: file source -> session_window -> memory sink."""
    df = _events(spark)
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sess = session_aggregates_stream(stream, "user", "ts", gap="30 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sess_out").collect()
    got = {(r.user, r.session_start.isoformat()): r.session_len for r in rows}
    assert got == {
        ("u1", "2024-01-01T00:00:00"): 2,
        ("u1", "2024-01-01T01:30:00"): 1,
        ("u2", "2024-01-01T00:01:00"): 1,
    }


def test_dedupe_stream_drops_in_horizon_duplicates(spark, tmp_path):
    """Real streaming run: duplicate event ids within the watermark horizon
    collapse to one row; state is watermark-bounded."""
    rows = [
        ("e1", T0, 1.0),
        ("e1", T0 + timedelta(minutes=1), 1.0),   # dup within horizon
        ("e2", T0 + timedelta(minutes=2), 2.0),
        ("e2", T0 + timedelta(minutes=2), 2.0),   # exact dup
        ("e3", T0 + timedelta(minutes=3), 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id string, ts timestamp, v double")
    src = str(tmp_path / "dd_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = dedupe_stream(stream, "event_id", "ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.sql("select * from dd_out").collect())
    assert got == ["e1", "e2", "e3"]
    # batch path: same call site, global dedup
    assert dedupe_stream(df, "event_id", "ts").count() == 3


def test_watermark_is_attached_on_streams(spark, tmp_path):
    df = _events(spark)
    src = str(tmp_path / "wm_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = windowed_counts(stream, "ts", window="5 minutes", watermark="10 minutes")
    assert out.isStreaming
    plan = out._jdf.queryExecution().logical().toString()
    assert "watermark" in plan.lower()
