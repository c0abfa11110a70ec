"""North-rule pipeline tests over the tokenized-sequence table.

Pins the BASELINE.json invariants: deterministic synthesis, exact
token-array equality per doc_id through the engine, zero temporal leakage,
and allclose on derived feature vectors vs a pandas recomputation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from transmog_spark.pipeline import token_features
from transmog_spark.sources import synth

N_DOCS = 600


@pytest.fixture(scope="module")
def feats(spark):
    return token_features(spark, N_DOCS, salt_buckets=2).cache()


def test_synth_sequences_deterministic(spark):
    a = synth.sequences(spark, 200).orderBy("doc_id").collect()
    b = synth.sequences(spark, 200, partitions=3).orderBy("doc_id").collect()
    assert a == b  # same seed, any partitioning -> identical rows


def test_input_shape_matches_north_rule(spark):
    s = synth.sequences(spark, 50)
    d = dict(s.dtypes)
    assert d["doc_id"] == "string" and d["tokens"] == "array<int>"
    assert d["n_tok"] == "int" and d["source"] == "string"
    bad = s.where(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_token_array_equality_through_explode_roundtrip(spark):
    """Explode tokens to one row per (doc, pos), reassemble, compare exactly —
    the engine's normalization must never reorder or lose a token."""
    seqs = synth.sequences(spark, 400)
    exploded = seqs.select("doc_id", F.posexplode("tokens").alias("pos", "tok"))
    rebuilt = exploded.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s.tok
        ).alias("tokens2")
    )
    cmp = seqs.join(rebuilt, "doc_id", "inner")
    assert cmp.count() == 400
    mismatches = cmp.where(F.col("tokens") != F.col("tokens2")).count()
    assert mismatches == 0


def test_pipeline_preserves_token_arrays_per_doc(spark, feats):
    """Exact token-array equality per doc_id between pipeline output and the
    source table (the north rule's per-row invariant)."""
    src = synth.sequences(spark, N_DOCS).select(
        "doc_id", F.col("tokens").alias("src_tokens")
    )
    cmp = feats.select("doc_id", "tokens").dropDuplicates(["doc_id"]).join(src, "doc_id")
    assert cmp.count() == N_DOCS
    assert cmp.where(F.col("tokens") != F.col("src_tokens")).count() == 0


def test_pipeline_zero_temporal_leakage(feats):
    bad = feats.where(
        F.col("feature_ts").isNotNull() & (F.col("feature_ts") > F.col("ts"))
    ).count()
    assert bad == 0


def test_pipeline_row_count_is_revision_count(spark, feats):
    meta = synth.sequence_meta(spark, N_DOCS)
    n_revs = meta.select(F.explode("meta.revisions")).count()
    assert feats.count() == n_revs


def test_feature_vectors_allclose_vs_pandas(spark, feats):
    """Derived per-source feature vector (n_tok stats + session/lag aggregates)
    recomputed in pandas from the same collected rows — allclose."""
    pdf = feats.select(
        "doc_id", "source", "ts", "rev", "rev_n_tok", "session_index", "rev_n_tok_lag1"
    ).toPandas()
    got = (
        feats.groupBy("source")
        .agg(
            F.avg("rev_n_tok").alias("mean_nt"),
            F.stddev_pop("rev_n_tok").alias("std_nt"),
            F.avg("session_index").alias("mean_sess"),
            F.count("rev_n_tok_lag1").alias("n_lagged"),
        )
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    g = pdf.groupby("source")
    exp_mean = g["rev_n_tok"].mean().sort_index()
    exp_std = g["rev_n_tok"].std(ddof=0).sort_index()
    exp_sess = g["session_index"].mean().sort_index()
    exp_lag = g["rev_n_tok_lag1"].count().sort_index()
    assert np.allclose(got["mean_nt"], exp_mean)
    assert np.allclose(got["std_nt"], exp_std)
    assert np.allclose(got["mean_sess"], exp_sess)
    assert (got["n_lagged"] == exp_lag).all()


def test_lag_within_doc_matches_pandas(feats):
    pdf = feats.select("doc_id", "ts", "rev", "rev_n_tok", "rev_n_tok_lag1").toPandas()
    pdf = pdf.sort_values(["doc_id", "ts", "rev"], kind="mergesort")
    exp = pdf.groupby("doc_id")["rev_n_tok"].shift(1)
    got = pdf["rev_n_tok_lag1"].astype("float64").reset_index(drop=True)
    assert got.equals(exp.astype("float64").reset_index(drop=True))


def test_skewed_source_present(spark):
    """The generator produces the skew the north rule demands (~50% hot)."""
    s = synth.sequences(spark, 2000)
    hot = s.where(F.col("source") == "src_hot").count()
    assert 0.4 * 2000 < hot < 0.6 * 2000
