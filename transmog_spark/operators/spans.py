"""Substring-level exact dedup — duplicated-span detection and removal.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499) remove every substring of >= 50 tokens that
appears more than once in the corpus, using a monolithic suffix array.
The distributed re-expression here uses fixed-length token n-grams: a
position is *duplicated* when its n-gram occurs >= ``min_count`` times
corpus-wide (including within the same document, as in the paper), and
per document the duplicated positions' coverage intervals
``[p, p + n - 1]`` are merged into maximal spans.

Deviation from the suffix-array formulation, documented: every duplicated
substring of length >= n is fully covered by duplicated n-grams, so span
*recall* at the paper's granularity is exact; two n-grams duplicated
against *different* sources can chain into one span (a conservative
over-approximation — the standard trade made by distributed n-gram
implementations of this filter).

Scale shape: the gram stream ships (id, pos, 8-byte md5-60 hash) — never
gram strings; the global count is one map-side-combined groupBy on the
hash; flagging is one hash-shuffled join of longs (AQE skew handles hot
boilerplate grams); span merging is a per-document window (state bounded
by document length). No driver actions, no UDFs, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.text import word_ngrams, ws_tokens


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (``id_col``, span_start, span_end, span_len) with 0-based
    inclusive token positions: every token in the span sits inside some
    n-gram that occurs >= ``min_count`` times in the corpus. Adjacent or
    overlapping coverage intervals merge into one span (gap > 1 between
    a position and the running max end starts a new span), so spans per
    document are disjoint and non-adjacent — deterministic in both
    engines (oracle: ``oracle.duplicate_spans_sql``).
    """
    grams = word_ngrams(ws_tokens(F.col(text_col)), n)
    # posexplode_outer + isNotNull(pos) == posexplode, without the
    # inferred generate filter re-evaluating the gram expression at the
    # scan (dedup.minhash_signatures note)
    g = df.select(
        F.col(id_col), F.posexplode_outer(grams).alias("__p", "__g")
    ).where(F.col("__p").isNotNull()).select(
        id_col, "__p", md5_long(F.col("__g")).alias("__gh")
    )
    # ONE shared gram-stream exchange (guide §2.4): the count branch and
    # the flag branch both need the stream hashed by __gh, but a plain
    # groupBy puts a partial aggregate BELOW its exchange, so the two
    # exchange subtrees differ and ReuseExchange cannot fire — the whole
    # tokenize→ngram→md5 construction (the expensive pass) used to run
    # TWICE.  An explicit hash repartition on __gh gives both branches a
    # byte-identical exchange child: the aggregate runs post-shuffle and
    # the join probes the same exchange via ReuseExchange.  The join
    # SHAPE stays (AQE still broadcast-sizes the dup side / splits skew).
    g = g.repartition("__gh")
    dup = (
        g.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("__gh")
    )
    dpos = g.join(dup, "__gh").select(id_col, "__p")

    w = Window.partitionBy(id_col).orderBy("__p")
    prev_end = F.max(F.col("__p") + (n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dpos.select(F.col(id_col), F.col("__p"), prev_end.alias("__pe"))
    new_span = F.when(
        F.col("__pe").isNull() | (F.col("__p") > F.col("__pe") + 1), 1
    ).otherwise(0)
    isl = flagged.select(
        id_col, "__p", F.sum(new_span).over(w).alias("__island")
    )
    return (
        isl.groupBy(id_col, "__island")
        .agg(
            F.min("__p").alias("span_start"),
            (F.max("__p") + (n - 1)).alias("span_end"),
        )
        .select(
            F.col(id_col),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("span_len"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
    min_count: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Apply span removal: per document, drop every token covered by a
    duplicated span and fingerprint what remains.

    Returns (``id_col``, n_tok, n_removed, clean_md5) — clean_md5 is the
    md5 hex of the kept tokens rejoined with single spaces (md5 of the
    empty string when nothing survives), so full texts never have to be
    hash-compared across engines. Pass a precomputed ``spans`` frame to
    reuse one detection pass across several strip configurations.

    Scale shape: spans collapse to one array per document
    (``collect_list`` state bounded by doc_len / n intervals); the kept
    filter is a per-row HOF over the token array (O(tokens × spans/doc)).
    Documents without any duplicated span pass through the left join with
    an empty span array.
    """
    if spans is None:
        spans = duplicate_spans(df, id_col, text_col, n=n, min_count=min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    out = df.join(per_doc, id_col, "left")
    toks = ws_tokens(F.col(text_col))
    sp = F.coalesce(
        F.col("__spans"),
        F.expr("CAST(array() AS array<struct<span_start:int,span_end:int>>)"),
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            sp, lambda s: (i >= s["span_start"]) & (i <= s["span_end"])
        ),
    )
    return out.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_tok"),
        (F.size(toks) - F.size(kept)).cast("int").alias("n_removed"),
        F.md5(F.concat_ws(" ", kept)).alias("clean_md5"),
    )
