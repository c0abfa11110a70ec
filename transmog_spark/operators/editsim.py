"""Edit-distance similarity join (fuzzy key dedup).

The short-string sibling of the token-level near-dup family
(``dedup.minhash_near_duplicates`` / ``ngram_jaccard_pairs``): find all id
pairs whose KEYS (titles, names, normalized URLs, product codes) are
within Levenshtein distance ``max_dist`` — the record-linkage /
metadata-dedup primitive that token shingles can't express (a one-char
typo changes every shingle of a short key). No reference analog; engine
surface for the training-data tier.

Candidate generation is PassJoin-style segment blocking (Li, Deng, Feng
"PASS-JOIN", PVLDB 2011 — public algorithm, re-derived here): partition
each string into ``max_dist + 1`` contiguous segments; if ed(s, t) <= d,
an optimal alignment's d edits touch at most d segments, so at least one
segment of s survives UNTOUCHED and appears in t verbatim, start-shifted
by at most d (the net indels before it). So:

* every string emits its d+1 (own_len, seg_idx, segment) keys, and
* every string probes, for each hypothetical partner length l in
  [len - d, len + d], each segment of THAT partition at start positions
  shifted by [-d, +d] — (2d+1) * (d+1) * (2d+1) probe keys per string
  (75 at d=2), all built by plan-time-unrolled expressions and exploded
  once.

Keys ship as 60-bit md5 hashes (8 bytes on the wire; a collision only
ADDS a candidate, never drops one — verification is exact). Strings
shorter than d+1 chars (whose partitions would contain empty segments)
go to one dedicated short block instead: seg side when len <= d, probe
side when len <= 2d — complete because the shorter string of a
distance-<= d pair bounds the longer's length.

The blocking is COMPLETE (no false negatives) when ``max_bucket`` is
None; the optional per-block cap is the documented skew/recall knob for
adversarial key distributions (same contract as the other blockers).
Verification is the exact JVM ``levenshtein`` on the joined key pair —
O(len^2) per candidate, which is why this operator is for SHORT keys;
for document bodies use the token-level family.

Scale shape: one explode (bounded fan-out per row), one wide join on the
8-byte hashed block key, distinct on canonicalized pairs, one exact
verification join — no corpus-sized driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long


def _seg_start(l: Column, i: int, k: int) -> Column:
    """floor(i * l / k) — exact for any realistic key length (the double
    division is exact below 2^53; keys are short strings by contract)."""
    return F.floor(l * F.lit(i) / F.lit(k)).cast("long")


def fuzzy_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "key",
    *,
    max_dist: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """All (id_a, id_b, dist) pairs with levenshtein(key_a, key_b) <=
    ``max_dist`` (id_a < id_b, each pair once). NULL keys are excluded
    (NULL is not within any distance of anything); duplicate ids are the
    caller's contract, as elsewhere.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    d = max_dist
    k = d + 1

    base = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__key")
    ).where(F.col(key_col).isNotNull())
    ln = F.length("__key").cast("long")

    # --- segment-side keys: (own_len, i, segment) for each of k segments
    seg_keys = []
    for i in range(k):
        st = _seg_start(ln, i, k)
        sl = _seg_start(ln, i + 1, k) - st
        seg_keys.append(
            F.when(
                sl > 0,
                md5_long(
                    F.concat_ws(
                        "#",
                        ln.cast("string"),
                        F.lit(str(i)),
                        F.substring(F.col("__key"), (st + 1).cast("int"), sl.cast("int")),
                    )
                ),
            )
        )
    # short block: strings with len <= d can pair with anything of len <= 2d
    seg_keys.append(F.when(ln <= d, md5_long(F.lit("__short"))))

    # --- probe-side keys: for each partner length l = len + delta, each
    # segment of THAT partition, at starts shifted by [-d, +d]
    probe_keys = []
    for delta in range(-d, d + 1):
        l = ln + F.lit(delta)
        for i in range(k):
            st = _seg_start(l, i, k)
            sl = _seg_start(l, i + 1, k) - st
            for shift in range(-d, d + 1):
                pos = st + F.lit(shift)
                ok = (l >= k) & (sl > 0) & (pos >= 0) & (pos + sl <= ln)
                probe_keys.append(
                    F.when(
                        ok,
                        md5_long(
                            F.concat_ws(
                                "#",
                                l.cast("string"),
                                F.lit(str(i)),
                                F.substring(
                                    F.col("__key"),
                                    (pos + 1).cast("int"),
                                    sl.cast("int"),
                                ),
                            )
                        ),
                    )
                )
    probe_keys.append(F.when(ln <= 2 * d, md5_long(F.lit("__short"))))

    segs = base.select(
        "__id",
        F.explode(
            F.array_distinct(
                F.filter(F.array(*seg_keys), lambda x: x.isNotNull())
            )
        ).alias("__bk"),
    )
    probes = base.select(
        "__id",
        F.explode(
            F.array_distinct(
                F.filter(F.array(*probe_keys), lambda x: x.isNotNull())
            )
        ).alias("__bk"),
    )
    if max_bucket is not None:
        wb = Window.partitionBy("__bk").orderBy("__id")
        segs = (
            segs.withColumn("__bn", F.row_number().over(wb))
            .where(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
        probes = (
            probes.withColumn("__bn", F.row_number().over(wb))
            .where(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )

    cand = (
        segs.select(F.col("__id").alias("__sid"), "__bk")
        .join(probes.select(F.col("__id").alias("__tid"), "__bk"), "__bk")
        .where(F.col("__sid") != F.col("__tid"))
        .select(
            F.least("__sid", "__tid").alias("id_a"),
            F.greatest("__sid", "__tid").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    ka = base.select(F.col("__id").alias("id_a"), F.col("__key").alias("__ka"))
    kb = base.select(F.col("__id").alias("id_b"), F.col("__key").alias("__kb"))
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .where(
            (F.abs(F.length("__ka") - F.length("__kb")) <= d)
            & (F.levenshtein("__ka", "__kb") <= d)
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__ka", "__kb").alias("dist"),
        )
    )


def dedupe_fuzzy(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "key",
    *,
    max_dist: int = 2,
    max_bucket: int | None = None,
    max_iterations: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Corpus application: keep one representative (min id) per
    fuzzy-duplicate cluster — ``dedupe_near`` over ``fuzzy_pairs``
    components."""
    from transmog_spark.operators.dedup import duplicate_components

    pairs = fuzzy_pairs(
        df, id_col, key_col, max_dist=max_dist, max_bucket=max_bucket
    )
    comps = duplicate_components(
        pairs, max_iterations=max_iterations, algorithm=algorithm
    )
    keep = comps.groupBy("cluster_id").agg(F.min("doc_id").alias("__keep"))
    drop = comps.join(
        keep, "cluster_id"
    ).where(F.col("doc_id") != F.col("__keep")).select("doc_id")
    return df.join(
        drop.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
