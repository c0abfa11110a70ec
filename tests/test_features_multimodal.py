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


# --------------------------------------------------------------------------
# Real codecs (pure-Python WAV/PPM): the NON-stub decode path
# --------------------------------------------------------------------------

import math
import struct

from transmog_spark.operators.codecs import (
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    ppm_feature_vector,
    wav_feature_vector,
)


def test_wav_roundtrip():
    samples = [0, 1000, -1000, 32767, -32768, 5]
    payload = encode_wav_pcm16(samples, 16000)
    sr, ch, got = decode_wav_pcm16(payload)
    assert (sr, ch, got) == (16000, 1, samples)


def test_wav_decoder_walks_extra_chunks():
    # insert a LIST chunk (odd length -> padded) between fmt and data, as a
    # real RIFF writer may: the chunk walker must skip it and keep alignment
    payload = encode_wav_pcm16([7, -7, 7], 8000)
    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    patched = payload[:fmt_end] + extra + payload[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    sr, ch, got = decode_wav_pcm16(patched)
    assert (sr, got) == (8000, [7, -7, 7])


def test_wav_rejects_non_pcm():
    payload = bytearray(encode_wav_pcm16([1, 2], 8000))
    payload[20] = 3  # format tag -> IEEE float
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav_pcm16(bytes(payload))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"not a wav")


def test_wav_features_sine_physics():
    # 440 Hz sine at amplitude 0.5, 1 s at 8 kHz: rms = A/sqrt(2),
    # zcr = 2 crossings per cycle
    sr, freq, amp, n = 8000, 440, 0.5, 8000
    samples = [
        int(round(amp * 32767 * math.sin(2 * math.pi * freq * i / sr)))
        for i in range(n)
    ]
    nsamp, rate, peak, rms, zcr = wav_feature_vector(
        encode_wav_pcm16(samples, sr)
    )
    assert (nsamp, rate) == (n, sr)
    assert peak == pytest.approx(amp, rel=1e-3)
    assert rms == pytest.approx(amp / math.sqrt(2), rel=1e-3)
    assert zcr == pytest.approx(2 * freq / sr, rel=0.01)


def test_ppm_roundtrip_and_features():
    # 2x2 solid orange-ish image
    px = bytes([200, 100, 50] * 4)
    payload = encode_ppm(px, 2, 2)
    w, h, maxval, got = decode_ppm(payload)
    assert (w, h, maxval, got) == (2, 2, 255, px)
    fw, fh, mr, mg, mb, luma = ppm_feature_vector(payload)
    assert (fw, fh) == (2.0, 2.0)
    assert mr == pytest.approx(200 / 255)
    assert mg == pytest.approx(100 / 255)
    assert mb == pytest.approx(50 / 255)
    assert luma == pytest.approx(0.299 * mr + 0.587 * mg + 0.114 * mb)


def test_ppm_header_comments_and_truncation():
    px = bytes([1, 2, 3])
    payload = b"P6\n# a comment\n1 1\n# another\n255\n" + px
    assert decode_ppm(payload) == (1, 1, 255, px)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(payload[:-1])
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P3\n1 1\n255\n...")


def test_extract_features_real_wav_decoder(spark):
    # the actual mapInPandas operator with the REAL decoder: Spark-side
    # features must byte-match the driver-side pure-Python computation
    payloads = {
        "w1": encode_wav_pcm16([100 * i for i in range(-50, 50)], 8000),
        "w2": encode_wav_pcm16([0, 0, 0, 1], 44100),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id string, payload binary",
    )
    got = {
        r.media_id: list(r.feature)
        for r in extract_features(df, decode_fn=wav_feature_vector).collect()
    }
    for k, v in payloads.items():
        assert got[k] == wav_feature_vector(v)


def test_ppm_resize_nn_known_mapping():
    """2x2 -> 4x4 upscale replicates each source pixel into a 2x2 block;
    4x4 -> 2x2 downscale keeps the top-left of each block (floor rule)."""
    from transmog_spark.operators.codecs import decode_ppm, encode_ppm, ppm_resize_nn

    # distinct RGB per pixel: pixel k has bytes (3k, 3k+1, 3k+2)
    src = encode_ppm(bytes(range(2 * 2 * 3)), 2, 2)
    up = ppm_resize_nn(src, 4, 4)
    w, h, mx, pix = decode_ppm(up)
    assert (w, h, mx) == (4, 4, 255)
    # output (x,y) samples source (x*2//4, y*2//4) = (x//2, y//2)
    for y in range(4):
        for x in range(4):
            sk = (y // 2) * 2 + (x // 2)
            assert pix[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3] == bytes(
                (3 * sk, 3 * sk + 1, 3 * sk + 2)
            )
    # round-trip down: floor rule picks source (x*4//2, y*4//2) = (2x, 2y)
    down = ppm_resize_nn(up, 2, 2)
    assert decode_ppm(down)[3] == decode_ppm(src)[3]


def test_ppm_resize_nn_identity_and_validation():
    from transmog_spark.operators.codecs import decode_ppm, encode_ppm, ppm_resize_nn

    src = encode_ppm(bytes((7,) * 3 * 3 * 3), 3, 3)
    assert decode_ppm(ppm_resize_nn(src, 3, 3))[3] == decode_ppm(src)[3]
    import pytest

    with pytest.raises(ValueError):
        ppm_resize_nn(src, 0, 3)
    with pytest.raises(ValueError):
        ppm_resize_nn(b"P6\n0 0\n255\n", 2, 2)


def test_resize_media_composes_with_extract_features(spark):
    """Binary->binary Arrow stage composes with the feature extractor
    downstream without a shuffle; feature means match the resized raster."""
    from transmog_spark.operators.codecs import encode_ppm, ppm_feature_vector
    from transmog_spark.operators.multimodal import extract_features, resize_media

    rows = [
        ("a", encode_ppm(bytes([255, 0, 0] * 4), 2, 2)),   # all red
        ("b", encode_ppm(bytes([0, 255, 0] * 9), 3, 3)),   # all green
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = extract_features(
        resize_media(df, 4, 4), decode_fn=ppm_feature_vector
    ).collect()
    got = {r.media_id: r.feature for r in out}
    assert got["a"][:2] == [4.0, 4.0] and got["a"][2] == 1.0 and got["a"][3] == 0.0
    assert got["b"][3] == 1.0 and got["b"][2] == 0.0
