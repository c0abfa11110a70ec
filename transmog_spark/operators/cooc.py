"""Token co-occurrence statistics (PMI pairs).

The GloVe / word2vec-prep stage: windowed co-occurrence counts over the
corpus plus pointwise mutual information — the table embedding trainers,
collocation extractors ("New York"), and lexicon-induction pipelines
consume. No reference analog (the reference is a flattening library);
expressed Spark-first.

Scale shape: pair generation is per-row ``zip_with`` against the token
array shifted by each distance d ≤ window (unrolled at plan time — the
``word_shingles`` shifted-slice idiom, O(tokens·window)/row, never the
O(n²) per-position slice). Pairs are canonicalized (lexicographic) so the
symmetric count lands on one key, then ONE map-side-combined groupBy.
Unigram counts ride a second explode of the same scan; both count frames
are vocabulary-bounded, so the final scoring joins broadcast. PMI uses
single-``ln`` doubles combined in a fixed expression order and rounded to
the 1e-4 grid — bit-identical in the DuckDB oracle; ranking uses the
scaled-integer grid with full lexicographic tie-breaks (the tfidf idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.operators.text import ws_tokens


def cooc_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 2,
    min_count: int = 2,
    k: int = 100,
    hashed_wire: bool = False,
) -> DataFrame:
    """Top-``k`` co-occurring token pairs by PMI.

    PMI = ln(c_ab · n_tok / (c_a · c_b)) over corpus unigram counts — the
    standard corpus-count approximation (positive for collocations, ~0 for
    independence). ``min_count`` floors c_ab (PMI is noise-dominated on
    rare pairs). Output: (tok_a, tok_b, c_ab, c_a, c_b, pmi, rank) with
    tok_a ≤ tok_b, ranked by (pmi grid desc, tok_a, tok_b).

    ``hashed_wire=True`` is the 100 TB posture (BENCH/cooc_scaling.md
    measured the string-key shuffle bandwidth-bound at 0.644): pair
    occurrences ship as 60-bit hashes (8 bytes, the spans wire), the
    min_count floor is applied on the hashed counts, and token strings are
    recovered by a second pass that keeps only qualifying pairs (broadcast
    hash semi-join + map-side-distinct mapping). Two scans instead of one
    pair pass, but the wide shuffle drops from ~2·window·avg_token_bytes
    to 8 bytes per occurrence. Same output (xxhash64-collision risk across
    ~vocab² pairs is negligible at 64 bits and the oracle would catch it).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = ws_tokens(F.col(text_col))
    docs = df.select(F.col(id_col).alias("__id"), toks.alias("t"))

    # all distances in one tagged array -> ONE explode of ONE scan
    def _pairs_at(d: int):
        shifted = F.slice(
            F.col("t"), d + 1, F.greatest(F.size("t") - d, F.lit(0))
        )
        # least/greatest SKIP nulls in Spark — gate on the shifted side
        # first or the zip's tail padding turns into bogus self-pairs
        return F.zip_with(
            F.col("t"),
            shifted,
            lambda a, b: F.when(
                b.isNotNull(),
                F.struct(F.least(a, b).alias("a"), F.greatest(a, b).alias("b")),
            ),
        )
    allp = F.filter(
        F.concat(*[_pairs_at(d) for d in range(1, window + 1)]),
        lambda p: p.isNotNull(),
    )
    if hashed_wire:
        # outer + isNotNull: allp elements are pre-filtered non-NULL;
        # avoids the inferred generate filter re-building the pair arrays
        # at the scan (dedup.minhash_signatures note)
        occ = docs.select(F.explode_outer(allp).alias("p")).where(
            F.col("p").isNotNull()
        ).select(
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
        )
        # xxhash64, NOT the md5 parity hash: the wire hash is internal
        # (strings are recovered before scoring, so the oracle never sees
        # it) and md5's hex round-trip measured 2x the whole string-wire
        # cost; xxhash64 is codegen'd and near-free
        ph = F.xxhash64(F.col("a"), F.col("b"))
        # phase 1: counts over 8-byte hashes only — the wide shuffle
        hcnt = (
            occ.select(ph.alias("__ph"))
            .groupBy("__ph")
            .agg(F.count(F.lit(1)).alias("c_ab"))
            .where(F.col("c_ab") >= min_count)
        )
        # phase 2: recover strings for qualifying pairs only — broadcast
        # hash semi-join, then a map-side-combined distinct of the
        # (hash, a, b) mapping (bounded by the qualifying-pair count)
        mapping = (
            occ.select("a", "b", ph.alias("__ph"))
            .join(F.broadcast(hcnt.select("__ph")), "__ph", "left_semi")
            .dropDuplicates(["__ph"])
        )
        pair_cnt = hcnt.join(mapping, "__ph").select(
            F.col("a").alias("tok_a"), F.col("b").alias("tok_b"), "c_ab"
        )
    else:
        pair_cnt = (
            docs.select(F.explode_outer(allp).alias("p"))
            .where(F.col("p").isNotNull())
            .groupBy(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
            .agg(F.count(F.lit(1)).alias("c_ab"))
            .where(F.col("c_ab") >= min_count)
        )

    uni = (
        docs.select(F.explode_outer("t").alias("tok"))
        .where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").alias("n")).select("n")

    scored = (
        pair_cnt.join(
            F.broadcast(uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))),
            "tok_a",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(n_tok))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.log(F.col("c_ab").cast("double"))
                + F.log(F.col("n").cast("double"))
                - F.log(F.col("c_a").cast("double"))
                - F.log(F.col("c_b").cast("double")),
                4,
            ).alias("pmi"),
        )
    )
    grid = F.round(F.col("pmi") * 10000).cast("long")
    w = Window.orderBy(grid.desc(), F.col("tok_a"), F.col("tok_b"))
    # the global window runs over the min_count-floored pair table, which
    # is vocabulary-bounded (and k-bounded after the filter), not corpus-
    # sized; at extreme vocabularies pre-slice with a grid-threshold filter
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("tok_a", "tok_b", "c_ab", "c_a", "c_b", "pmi", "rank")
    )


def ngram_diversity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    *,
    max_n: int = 3,
) -> DataFrame:
    """Per-source n-gram diversity: distinct/total ratio for n = 1..max_n.

    The corpus-QA adaptation of self-BLEU / distinct-n generation metrics:
    a source whose distinct-2/3-gram ratios crater is template spam or a
    mirror even when document-level dedup passes. One tagged explode (the
    repetition_profile idiom) -> one (source, n, gram-hash) distinct-vs-
    total agg; gram strings never ship — 8-byte hashes do.
    """
    from transmog_spark.functions.hashing import md5_long
    from transmog_spark.operators.text import word_ngrams

    toks = ws_tokens(F.col(text_col))

    def _tagged(n: int):
        return F.transform(
            word_ngrams(toks, n),
            lambda g: F.struct(F.lit(n).alias("gn"), g.alias("g")),
        )

    rows = df.select(
        F.col(source_col).alias("source"),
        F.explode_outer(
            F.concat(*[_tagged(n) for n in range(1, max_n + 1)])
        ).alias("x"),
    ).where(F.col("x").isNotNull()).select(
        "source", F.col("x.gn").alias("n"), md5_long(F.col("x.g")).alias("gh")
    )
    agg = rows.groupBy("source", "n").agg(
        F.count(F.lit(1)).alias("total_grams"),
        F.countDistinct("gh").alias("distinct_grams"),
    )
    return agg.select(
        "source",
        F.col("n").cast("int").alias("n"),
        "total_grams",
        "distinct_grams",
        F.round(
            F.col("distinct_grams").cast("double") / F.col("total_grams"), 4
        ).alias("distinct_ratio"),
    )
