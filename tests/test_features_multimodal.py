"""Tests for vectorized token features and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transmog_spark.operators.features import (
    source_stats,
    with_lagged_token_window,
    with_token_stats,
)
from transmog_spark.operators.multimodal import (
    attach_media_meta,
    decode_stub,
    extract_features,
    frame_sample_plan,
)
from transmog_spark.sources import synth


def test_token_stats_values(spark):
    df = spark.createDataFrame(
        [("a", [3, 1, 3, 7]), ("b", [])], "doc_id string, tokens array<int>"
    )
    out = {r.doc_id: r for r in with_token_stats(df).collect()}
    a = out["a"]
    assert (a.n_tok, a.tok_min, a.tok_max, a.tok_sum) == (4, 1, 7, 14)
    assert a.tok_mean == pytest.approx(3.5)
    assert a.tok_distinct == 3
    assert a.tok_head8 == [3, 1, 3, 7]
    b = out["b"]
    assert b.n_tok == 0 and b.tok_mean is None and b.tok_head8 == []


def test_lagged_token_window(spark):
    seqs = synth.sequences(spark, 50).withColumn(
        "ent", F.substring("doc_id", 12, 1)  # small entity groups
    )
    out = with_lagged_token_window(seqs, key="ent", ts="doc_id", head=4)
    pdf = out.select("ent", "doc_id", "tokens", "prev_tok_head").toPandas()
    pdf = pdf.sort_values(["ent", "doc_id"], kind="mergesort")
    for _, g in pdf.groupby("ent"):
        prev = None
        for _, row in g.iterrows():
            if prev is None:
                assert row.prev_tok_head is None
            else:
                assert list(row.prev_tok_head) == list(prev[:4])
            prev = row.tokens


def test_source_stats_match_collected(spark):
    seqs = synth.sequences(spark, 300)
    got = {r.source: r for r in source_stats(seqs).collect()}
    pdf = seqs.select("source", "n_tok").toPandas()
    for src, g in pdf.groupby("source"):
        r = got[src]
        assert r.n_docs == len(g)
        assert r.total_tokens == g.n_tok.sum()
        assert r.avg_n_tok == pytest.approx(g.n_tok.mean())


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNGfakebytes"), ("image/png", 64, 48, None, None)),
        ("m2", "audio", bytearray(b"RIFFfakewav"), ("audio/wav", None, None, 4500, 16000)),
        ("m3", "video", bytearray(b"\x00\x00ftypmp4"), ("video/mp4", 320, 240, 3200, None)),
        ("m4", "image", None, ("image/png", 1, 1, None, None)),
    ]
    schema = (
        "media_id string, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int,sample_rate:int>"
    )
    return spark.createDataFrame(rows, schema)


def test_attach_media_meta(media_df):
    out = {r.media_id: r for r in attach_media_meta(media_df).collect()}
    assert out["m1"].payload_bytes == 13
    assert out["m4"].payload_bytes is None
    assert len(out["m1"].payload_sha1) == 40


def test_extract_features_deterministic_fake(media_df):
    a = {r.media_id: list(r.feature) for r in extract_features(media_df, feature_dim=8).collect()}
    b = {r.media_id: list(r.feature) for r in extract_features(media_df, feature_dim=8).collect()}
    assert a == b  # deterministic
    assert all(len(v) == 8 for v in a.values())
    assert a["m1"] != a["m2"]
    assert a["m4"] == [0.0] * 8  # null payload -> zero vector


def test_extract_features_custom_decode_fn(media_df):
    out = extract_features(
        media_df, feature_dim=2, decode_fn=lambda p: [float(len(p or b"")), 1.0]
    ).collect()
    got = {r.media_id: list(r.feature) for r in out}
    assert got["m1"] == [13.0, 1.0]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"x")


def test_frame_sample_plan(media_df):
    plan = frame_sample_plan(media_df.where(F.col("kind") == "video"), every_ms=1000)
    rows = sorted((r.media_id, r.frame_ts_ms) for r in plan.collect())
    assert rows == [("m3", 0), ("m3", 1000), ("m3", 2000)]
