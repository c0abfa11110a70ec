"""Feature hashing ("the hashing trick", Weinberger, Dasgupta, Langford,
Smola & Attenberg 2009, "Feature Hashing for Large Scale Multitask
Learning"): map each token to one of ``dim`` buckets by hash and
accumulate a signed term frequency per bucket — a fixed-width embedding
of arbitrary vocabulary with NO trained model, no vocabulary table and
no driver state. The signed second hash makes the inner product an
unbiased estimator of the true (unhashed) inner product (paper §3), so
hashed-cosine ranking approximates true token-overlap cosine.

This is the model-free bridge from the text corpus to the ANN/similarity
stack: documents become comparable vectors in one pass, with exact
integer weights the DuckDB oracle reproduces bit-for-bit.

Scale shape: the feature build is one token-explode pass with a
map-side-combined (id, bucket) rollup — at most ``dim`` rows per
document on the wire, exact longs. ``hashed_cosine_topk`` broadcasts the
(tiny, filter-bounded) query side and its norms; the corpus side is
scored via one broadcast-hash join + rollup, never shuffled. Exact
search over everything it touches — at retrieval scale, feed these
vectors to the IVF/PQ tiers (operators/similarity.py) instead and keep
this as the ground-truth scorer.

No reference analog (the reference is a flattening library); the
operator exists for the training-data tier (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long, seeded
from transmog_spark.operators.text import ws_tokens


def hash_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 256,
    seed: int = 1,
) -> DataFrame:
    """Sparse hashed feature vectors: (id, bucket, w) with
    w = Σ_occurrences sign(term), sign ∈ {+1, -1} from an independent
    hash. Buckets whose signed sum cancels to 0 are dropped (they
    contribute nothing to any inner product) — mirrored in the oracle.
    """
    # explode_outer + isNotNull: ws_tokens elements are never NULL; the
    # post-generate filter replaces the inferred scan-side size>0 filter
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(ws_tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term").isNotNull())
    bucket = F.pmod(md5_long(seeded(F.col("term"), f"b{seed}")), dim)
    sign = F.when(
        F.pmod(md5_long(seeded(F.col("term"), f"s{seed}")), 2) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        toks.select("id", bucket.alias("bucket"), sign.alias("__sign"))
        .groupBy("id", "bucket")
        .agg(F.sum("__sign").cast("long").alias("w"))
        .where(F.col("w") != 0)
    )


def hashed_cosine_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 256,
    seed: int = 1,
    query_filter: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k nearest documents by hashed-feature cosine for each
    query document (``query_filter`` bounds the query set — the broadcast
    side). Returns (query_id, id, dot, cos, rank); ``dot`` is the exact
    integer inner product, ``cos`` is round(dot / sqrt(|a||b|), 4), and
    rank orders by (cos DESC, id) AFTER rounding so the DuckDB oracle
    ranks identically (CLAUDE.md double-math rule). Self-matches are
    excluded.

    The explicit isNotNull filters keep the norm and dot branches of the
    corpus feature frame canonically identical (null-id rows already drop
    at the id != query_id predicate), so ReuseExchange scans the corpus
    ONCE for both instead of once per branch.
    """
    feats = hash_features(df, id_col, text_col, dim=dim, seed=seed).where(
        F.col("id").isNotNull() & F.col("bucket").isNotNull()
    )
    norms = feats.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sumsq")
    )
    # query-side features hash ONLY the filtered docs (a pure per-doc
    # function, so identical to slicing the corpus-wide pass) — the
    # broadcast side never rescans the corpus
    q_docs = df.where(query_filter)
    qf = hash_features(q_docs, id_col, text_col, dim=dim, seed=seed)
    qn = qf.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("q_sumsq")
    ).withColumnRenamed("id", "query_id")
    qf = qf.withColumnsRenamed({"id": "query_id", "w": "qw"})
    dots = (
        feats.join(F.broadcast(qf), "bucket")
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum(F.col("w") * F.col("qw")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(norms, "id")
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "id",
            "dot",
            F.round(
                F.col("dot")
                / F.sqrt((F.col("sumsq") * F.col("q_sumsq")).cast("double")),
                4,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "dot", "cos", "rank")
    )


def centroid_classify(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    *,
    dim: int = 256,
    seed: int = 1,
    labeled_filter: str | None = None,
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification over hashed features:
    per-label centroids from the ``labeled_filter`` subset (default: all
    rows), then every document is assigned the label whose centroid has
    the highest cosine. The domain-routing primitive for curation: tag
    unlabeled ingest with the nearest existing domain, or audit labels by
    flagging docs whose text sits closer to another domain's centroid.

    Exactness: cosine is scale-invariant, so the centroid is kept as the
    UNSCALED integer sum vector (label, bucket, sw = Σw) — identical
    ranking to the mean vector with no division anywhere before the final
    cosine, whose dot and sumsq terms are exact longs rounded to 4
    decimals BEFORE the argmax with a label tie-break, mirrored in
    ``oracle.centroid_classify_sql``.

    Output: (id, label, cos, true_label) — one row per (doc, best label).

    Scale shape: the centroid table is (labels × dim) rows — broadcast;
    scoring is one broadcast join on bucket + per-doc rollup; the argmax
    is a per-doc window over ≤ n_labels rows. The corpus never shuffles
    on anything but its own id rollups. The explicit isNotNull filters on
    the feature frame are semantic no-ops (null-id rows drop out of every
    join below anyway) but keep all three feature consumers canonically
    identical, so ReuseExchange computes the hashed features ONCE instead
    of re-scanning the corpus per consumer (the vocab_kl lesson; pinned in
    tests/test_plan_quality.py).
    """
    feats = hash_features(df, id_col, text_col, dim=dim, seed=seed).where(
        F.col("id").isNotNull() & F.col("bucket").isNotNull()
    )
    labels = df.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("true_label")
    )
    train_ids = (
        df.where(labeled_filter) if labeled_filter is not None else df
    ).select(F.col(id_col).alias("id"))
    cents = (
        feats.join(train_ids, "id")
        .join(labels, "id")
        .groupBy(F.col("true_label").alias("label"), "bucket")
        .agg(F.sum("w").cast("long").alias("sw"))
    )
    cent_stats = cents.groupBy("label").agg(
        F.sum(F.col("sw") * F.col("sw")).cast("long").alias("c_sumsq")
    )
    doc_norms = feats.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("d_sumsq")
    )
    dots = (
        feats.join(F.broadcast(cents), "bucket")
        .groupBy("id", "label")
        .agg(F.sum(F.col("w") * F.col("sw")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(cent_stats), "label")
        .join(doc_norms, "id")
        .select(
            "id",
            "label",
            F.round(
                F.col("dot")
                / F.sqrt((F.col("d_sumsq") * F.col("c_sumsq")).cast("double")),
                4,
            ).alias("cos"),
        )
    )
    win = Window.partitionBy("id").orderBy(F.col("cos").desc(), F.col("label").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") == 1)
        .join(labels, "id")
        .select("id", "label", "cos", "true_label")
    )
