"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm).

Each document's token k-gram rolling-hash stream is reduced to a sparse
fingerprint set: in every window of ``w`` consecutive gram hashes, select
the minimum (rightmost on ties). The paper's guarantee: any shared
substring of at least ``k + w - 1`` tokens produces at least one SHARED
fingerprint, at an expected density of 2/(w+1) — so near-dup detection
ships O(len/w) longs per document instead of the full gram stream
(contrast ``spans.duplicate_spans``, which ships every position).

Deviations, documented: grams are word k-grams rather than the paper's
character k-grams (the engine's tokens-first posture; same guarantee at
token granularity), and a document shorter than ``k + w - 1`` tokens
contributes the minimum of its full (partial) gram stream so short
documents still fingerprint — both rules mirrored exactly in the DuckDB
oracle (``oracle.winnow_fingerprints_sql``).

Scale shape: the gram stream is (id, pos, 8-byte md5-60 hash) — never
gram strings; selection is one per-document window pass (state = w
rows); pair generation buckets on fp_hash with an explicit ``max_bucket``
cap, the same guarded shape as MinHash banding. No driver actions, no
UDFs, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.text import word_ngrams, ws_tokens


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Selected fingerprints per document: (``id_col``, fp_pos, fp_hash),
    distinct. fp_pos is the 0-based gram position whose hash was selected;
    a (pos, hash) pair selected by several overlapping windows appears
    once.

    Rightmost-min tie-break via ``min(struct(hash, -pos))`` over the
    w-row window — struct comparison is lexicographic in both engines, so
    min hash wins, then the LARGEST pos among equal hashes (the paper's
    rule, which keeps expected density at 2/(w+1) even on low-entropy
    hash streams).
    """
    grams = word_ngrams(ws_tokens(F.col(text_col)), k)
    # posexplode_outer + isNotNull(pos): see spans.py — same rationale
    g = df.select(
        F.col(id_col), F.posexplode_outer(grams).alias("__p", "__g")
    ).where(F.col("__p").isNotNull()).select(
        id_col, "__p", md5_long(F.col("__g")).alias("__gh")
    )
    part = Window.partitionBy(id_col)
    win = part.orderBy("__p").rowsBetween(-(w - 1), 0)
    sel = g.select(
        F.col(id_col),
        F.col("__p"),
        F.max("__p").over(part).alias("__maxp"),
        F.min(
            F.struct(F.col("__gh").alias("h"), (-F.col("__p")).alias("np"))
        ).over(win).alias("__fp"),
    )
    # full windows only (window ends at p >= w-1); a doc with fewer than w
    # grams gets the single whole-stream window ending at its last gram
    return (
        sel.where(F.col("__p") >= F.least(F.lit(w - 1), F.col("__maxp")))
        .select(
            F.col(id_col),
            (-F.col("__fp.np")).cast("int").alias("fp_pos"),
            F.col("__fp.h").alias("fp_hash"),
        )
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs by shared fingerprints: (id_a, id_b,
    shared) with id_a < id_b and ``shared`` = number of DISTINCT
    fingerprint hashes the two documents share, filtered to
    ``>= min_shared``.

    One bucket-join on fp_hash (the 2/(w+1)-density stream, not the gram
    stream); buckets larger than ``max_bucket`` are truncated by id order
    — the same explicit cap MinHash banding carries, bounding worst-case
    fan-out on degenerate corpora (a boilerplate fingerprint shared by
    millions of docs would otherwise generate a quadratic pair set).
    """
    fps = (
        winnow_fingerprints(df, id_col, text_col, k=k, w=w)
        .select(F.col(id_col).alias("id"), "fp_hash")
        .distinct()
    )
    capped = (
        fps.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("fp_hash").orderBy("id")
            ),
        )
        .where(F.col("__rn") <= max_bucket)
        .drop("__rn")
    )
    a = capped.select(F.col("id").alias("id_a"), "fp_hash")
    b = capped.select(F.col("id").alias("id_b"), "fp_hash")
    pairs = a.join(b, "fp_hash").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
