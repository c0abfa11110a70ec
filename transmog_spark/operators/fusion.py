"""Rank fusion for hybrid retrieval (lexical BM25 × semantic ANN).

The production retrieval stack over a curated corpus runs two tiers in
parallel — a term-based lexical ranking (``corpus.bm25_topk`` /
``bm25_topk_indexed``) and an embedding-based semantic ranking
(``similarity.brute_force_topk`` / ``ivf_topk`` / ``rerank_topk``) — and
fuses their top-R lists with reciprocal-rank fusion (RRF; Cormack, Clarke
& Büttcher, SIGIR 2009): ``score(d) = Σ_i w_i / (rrf_k + rank_i(d))``.
RRF needs only RANKS, never the tiers' incommensurable raw scores, which
is exactly why it is the default hybrid combiner in production search
engines (Elasticsearch/OpenSearch hybrid search, Vespa).

Beyond the reference's surface (transmog is a flattening library with no
retrieval tier); this completes the two-tier stack the repo already
ships.

Determinism: each contribution is computed on a scaled-integer grid —
``round(w_i · 10^6 / (rrf_k + rank))`` summed as a long — so the fused
score is addition-order independent and bit-identical between Spark and
the DuckDB oracle (the same idiom as ``bm25_topk``'s per-doc sum).

Scale shape: the inputs are per-query top-R lists (|Q|·R rows — the
corpus-scale work already happened inside the tiers), so fusion is one
unionByName of skinny (query, id, rank) frames + one map-side-combined
groupBy over |Q|·R·n_lists rows, then a top-k. Global (no query column)
top-k uses ``orderBy().limit(k)`` — a TakeOrdered, never a whole-frame
single-partition window; per-query top-k windows over candidate sets
bounded by R·n_lists per query.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # the SIGIR-2009 paper's constant, also the Elasticsearch default
_GRID = 1_000_000  # 1e-6 contribution grid (max |lists| · w · 1e6 ≪ 2^63)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    query_col: str | None = None,
    k: int = 10,
    rrf_k: int = RRF_K,
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """Fuse N ranked lists by weighted reciprocal-rank fusion.

    Each input frame needs (``id_col``, ``rank_col``) — any extra columns
    (raw scores, match counts) are dropped: RRF is rank-only by design.
    An item missing from a list contributes 0 for that list (the standard
    convention). With ``query_col`` set, every input must carry it and
    fusion/top-k run per query; without it the lists are global and the
    output is a single fused top-``k``.

    Returns (``[query_col,] id_col, rrf_score, n_lists, rank``) where
    ``rrf_score = Σ_i round(w_i·10^6/(rrf_k+rank_i)) / 10^6`` and
    ``n_lists`` counts how many input lists ranked the item (the
    both-tiers-agree signal). Rank ties break on ascending id.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError(
            f"{len(weights)} weights for {len(rankings)} rankings"
        )
    if rrf_k < 0:
        raise ValueError(f"rrf_k must be >= 0, got {rrf_k}")

    parts = []
    for i, r in enumerate(rankings):
        w = 1.0 if weights is None else float(weights[i])
        contrib = (
            F.round(F.lit(w * _GRID) / (F.lit(rrf_k) + F.col(rank_col)))
            .cast("long")
            .alias("__contrib")
        )
        cols = [F.col(id_col), contrib]
        if query_col is not None:
            cols.insert(0, F.col(query_col))
        parts.append(r.select(*cols))
    union = reduce(DataFrame.unionByName, parts)

    keys = [query_col, id_col] if query_col is not None else [id_col]
    fused = union.groupBy(*keys).agg(
        (F.sum("__contrib").cast("double") / _GRID).alias("__score"),
        F.count(F.lit(1)).alias("n_lists"),
    )

    order = [F.col("__score").desc(), F.col(id_col).asc()]
    if query_col is None:
        topk = fused.orderBy(*order).limit(k)
        w_rank = Window.orderBy(*order)
    else:
        w_rank = Window.partitionBy(query_col).orderBy(*order)
        topk = fused
    out = topk.withColumn("rank", F.row_number().over(w_rank)).where(
        F.col("rank") <= k
    )
    return out.select(
        *keys,
        F.round("__score", 6).alias("rrf_score"),
        "n_lists",
        "rank",
    )


def hybrid_topk(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_vec_id: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    depth: int = 20,
    rrf_k: int = RRF_K,
    lexical_weight: float = 1.0,
    semantic_weight: float = 1.0,
) -> DataFrame:
    """Hybrid document retrieval: BM25 top-``depth`` for ``query_terms``
    fused (RRF) with exact-cosine top-``depth`` around the query document
    ``query_vec_id``, over a corpus where ``embeddings.vec_id`` keys the
    same documents as ``documents.doc_id``.

    The convenience composition of the stack's pieces — each tier stays
    independently replaceable (swap the exact scorer for
    ``ivf_topk``+``rerank_topk`` at scale; swap ``bm25_topk`` for
    ``bm25_topk_indexed`` once the index is materialized) because the
    fusion consumes only (id, rank).

    The semantic tier ranks on the round-6 cosine grid with an id
    tie-break (the determinism idiom every indexed ANN tier and
    ``rerank_topk`` use — raw doubles differ in last ulps between Spark's
    fold and DuckDB's ``list_cosine_similarity`` and a ulp flip here would
    corrupt the FUSED scores of two documents, not just reorder a tie).
    Its top-``depth`` is ``orderBy().limit()`` — a TakeOrdered — with the
    rank window over only the collected ``depth`` rows.
    """
    from transmog_spark.operators.corpus import bm25_topk
    from transmog_spark.operators.dedup import cosine_sim

    lexical = bm25_topk(
        documents, list(query_terms), id_col, text_col, k=depth
    )
    q = embeddings.where(F.col(vec_id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv")
    )
    c = embeddings.where(F.col(vec_id_col) != query_vec_id).select(
        F.col(vec_id_col).alias(id_col), F.col(vec_col).alias("__cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        id_col,
        F.round(cosine_sim(F.col("__qv"), F.col("__cv")), 6).alias("__cos"),
    )
    sem_order = [F.col("__cos").desc(), F.col(id_col).asc()]
    sem_topk = scored.orderBy(*sem_order).limit(depth)
    semantic = (
        sem_topk.withColumn(
            "rank", F.row_number().over(Window.orderBy(*sem_order))
        )
        .select(id_col, "rank")
    )
    return rrf_fuse(
        [lexical.select(id_col, "rank"), semantic],
        id_col=id_col,
        k=k,
        rrf_k=rrf_k,
        weights=[lexical_weight, semantic_weight],
    )
