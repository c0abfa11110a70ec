"""Approximate-nearest-neighbor search over embedding columns.

Two tiers:

* ``brute_force_topk`` — exact cosine top-k of a *small* query set against
  the corpus: broadcast the queries, one narrow pass over the corpus, one
  shuffle for the per-query top-k window. The baseline/oracle path.
* ``lsh_topk`` — random-hyperplane LSH: bucket-join queries to corpus rows
  sharing a signature, rank within buckets. Scale path: corpus is never
  crossed with queries; shuffle volume is O(n_probes · |corpus bucket|).
  Multi-probe (flip one signature bit) trades recall for fan-out.

Deterministic hyperplanes (md5-derived, no RNG) so results are stable
across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.dedup import _hyperplane_signature, cosine_sim


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query. Queries should be small (broadcast)."""
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact-rerank stage of a two-stage retrieval stack: take ANY
    approximate tier's per-query top-R candidate set (``ivf_topk`` /
    ``pq_topk`` / ``ivfpq_topk`` / ``lsh_topk`` output — only
    (query_id, neighbor_id) is read), re-score those candidates with exact
    full-precision similarity, and return the exact top-``k``.
    ``metric='cosine'`` (default) matches ``brute_force_topk``;
    ``metric='l2'`` reranks in the PQ tiers' own metric (output column
    ``dist2``, ascending) — FAISS ``IndexRefineFlat`` reranks in the
    index metric likewise.

    This is the operator that makes the PQ/IVFPQ tiers usable: compressed
    codes rank coarsely (recall@5 near the information-theoretic floor at
    small code budgets) but rank WELL ENOUGH that the true neighbors sit
    inside a modest top-R — so approx(top-R) → exact(top-k) recovers
    brute-force quality while scoring only |Q|·R full vectors instead of
    |Q|·|corpus| (the FAISS ``IndexRefineFlat`` / re-ranking posture,
    Jégou et al. 2011 §V.D).

    Scale shape: ``candidates`` is |Q|·R rows — broadcast into the corpus
    scan, so only candidate corpus rows survive the (broadcast-hash) join
    and the full-precision vectors of non-candidates never leave the scan;
    queries broadcast likewise; one window top-k over |Q|·R rows. Zero
    corpus shuffle.

    Output schema matches ``brute_force_topk``: (query_id, neighbor_id,
    cosine, rank) — so recall@k is a direct set compare (cosine here is
    rounded to 4 decimals; ranking runs on the round-6 grid).
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    qid = query_id_col or id_col
    cand = candidates.select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    joined = c.join(F.broadcast(cand), "neighbor_id").join(
        F.broadcast(q), "query_id"
    )
    if metric == "l2":
        d2 = F.aggregate(
            F.zip_with(
                F.col("__qv"),
                F.col("__cv"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored = joined.select("query_id", "neighbor_id", d2.alias("dist2"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist2").asc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dist2", "rank")
        )
    # same determinism idiom as ivf_topk/sq8/lsh: rank on round(cos, 6)
    # with an id tie-break — raw doubles differ in the last ulps between
    # Spark's fold and DuckDB's list_cosine_similarity and can flip top-k
    # membership — and output round(round6, 4) to match the oracle's
    # double-rounding exactly
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def retrieval_recall(
    approx: DataFrame,
    exact: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of an approximate retrieval against exact ground
    truth — the index-quality monitor that belongs IN the pipeline, not in
    a one-off script: every ANN deployment re-checks recall@k whenever the
    corpus distribution drifts or an index is rebuilt (the BENCH/ann.md
    matrix as a first-class operator). ``exact`` is the ground-truth top-k
    frame (e.g. ``brute_force_topk`` on a sampled query set), ``approx``
    any tier's result (ivf/ivfpq/lsh/sq8/pq, indexed or not) over the same
    queries.

    Output: (query_col, n_exact, n_hit, recall) — recall = |approx ∩
    exact| / |exact| per query, on the round-4 grid. Aggregate across
    queries downstream (mean, min, per-slice) as needed.

    Scale shape: both inputs are |Q|·k rows by construction — the corpus
    never enters; one equi-join on (query, neighbor) and one
    map-side-combined groupBy. Unmatched ground-truth rows LEFT-join to
    NULL and count as misses, so an approx tier that returns fewer than k
    rows (empty probe buckets) is scored honestly, not skipped. Both
    sides are projected DISTINCT on (query, neighbor) first — a caller
    passing a frame with repeated rows (e.g. a multi-probe tier that
    emits a candidate once per probe) would otherwise inflate n_exact and
    n_hit through join multiplicity.
    """
    ex = exact.select(F.col(query_col), F.col(id_col)).distinct()
    ap = approx.select(
        F.col(query_col), F.col(id_col)
    ).distinct().withColumn("__hit", F.lit(1))
    hits = F.coalesce(F.sum("__hit"), F.lit(0)).cast("long")
    return (
        ex.join(ap, [query_col, id_col], "left")
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            hits.alias("n_hit"),
            F.round(hits.cast("double") / F.count(F.lit(1)), 4).alias("recall"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k_hard: int = 5,
    k_rand: int = 0,
    seed: int | str = 0,
    exclude_self: bool = True,
) -> DataFrame:
    """Negative mining for contrastive/embedding-model training data: for
    each query, the ``k_hard`` most-cosine-similar corpus documents that
    are NOT known positives (kind='hard' — the DPR/ANCE in-batch-plus-hard
    recipe, Karpukhin et al. 2020 §3.2), plus ``k_rand`` deterministic
    uniform negatives drawn from the remaining non-positive corpus
    (kind='random' — the easy-negative floor). ``positives`` is any frame
    with (query_id, neighbor_id) rows naming the labeled relevant docs;
    they are anti-joined out so the miner can never emit a false negative
    that is actually a labeled positive.

    Determinism: scoring on the scaled-integer e6 grid
    (``round(cos·10⁶)`` as BIGINT — the lm-family idiom; a second decimal
    rounding of a grid-forced double hits the x.xxxx5 boundary ~1/100 rows
    and flips between Java BigDecimal and C libm rounding), hard ranking
    by that integer with an id tie-break; random ranking on the seeded
    60-bit md5 of ``seed#query#neighbor`` — no RNG state, same sample on
    any cluster size or engine.

    Scale shape: ONE corpus scan — queries and positives are
    contract-small (a probe/training batch) and broadcast; scoring is
    JVM-side zip_with; the two tiers are selected in a single windowed
    pass (hard = row_number on the score order; random = conditional
    cumulative count on the md5 order — a union of two rank filters would
    duplicate the whole scored subplan and scan the corpus twice), so the
    scored frame crosses exactly one Exchange. At 100 TB the corpus never
    shuffles and never materializes more than the |Q|·|C| scored stream
    that brute-force scoring itself requires; swap the scoring stage for
    an ANN tier (ivf/ivfpq + rerank) when |C| makes exact scoring
    unaffordable — the anti-join and sampling stages are tier-agnostic.

    Output: (query_id, neighbor_id, cosine_e6, kind, rank) — rank 1..k
    within each (query, kind); ``cosine_e6`` is the integer-grid score
    (divide by 10⁶ for the float value).
    """
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    pos = positives.select("query_id", "neighbor_id").distinct()
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    joined = joined.join(F.broadcast(pos), ["query_id", "neighbor_id"], "left_anti")
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("__qv"), F.col("__cv")) * F.lit(1_000_000.0))
        .cast("long")
        .alias("cosine_e6"),
    )
    w_hard = Window.partitionBy("query_id").orderBy(
        F.col("cosine_e6").desc(), F.col("neighbor_id").asc()
    )
    scored = scored.withColumn("__hr", F.row_number().over(w_hard))
    if k_rand <= 0:
        # pure hard path: plain rank filter keeps the WindowGroupLimit
        # (map-side top-k) pushdown available
        return scored.where(F.col("__hr") <= k_hard).select(
            "query_id",
            "neighbor_id",
            "cosine_e6",
            F.lit("hard").alias("kind"),
            F.col("__hr").alias("rank"),
        )
    # random negatives draw from the corpus BEYOND the hard set (standard:
    # hards are informative, randoms calibrate the easy floor). Their rank
    # is a CONDITIONAL CUMULATIVE COUNT of non-hard rows in seeded-md5
    # order — identical to row_number over the filtered subset (filtering
    # preserves relative order) but computed in the SAME windowed pass, so
    # the union-of-two-rank-filters plan (which re-scans the corpus per
    # branch) never exists; both windows share the query_id Exchange.
    u = md5_long(
        F.concat(
            F.lit(f"{seed}#"),
            F.col("query_id").cast("string"),
            F.lit("#"),
            F.col("neighbor_id").cast("string"),
        )
    )
    w_rand = (
        Window.partitionBy("query_id")
        .orderBy(u.asc(), F.col("neighbor_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rr = F.sum(F.when(F.col("__hr") > k_hard, 1).otherwise(0)).over(w_rand)
    out = scored.withColumn("__rr", rr).where(
        (F.col("__hr") <= k_hard)
        | ((F.col("__hr") > k_hard) & (F.col("__rr") <= k_rand))
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "cosine_e6",
        F.when(F.col("__hr") <= k_hard, F.lit("hard"))
        .otherwise(F.lit("random"))
        .alias("kind"),
        F.when(F.col("__hr") <= k_hard, F.col("__hr"))
        .otherwise(F.col("__rr"))
        .cast("int")
        .alias("rank"),
    )


def _round_half_up_np(x, nd: int):
    # HALF_UP on the round-`nd` decimal grid, matching Spark's F.round and
    # DuckDB's round() (both half-away-from-zero) — numpy's own np.round is
    # half-even and would diverge at exact .5e-nd boundaries.
    import numpy as np

    p = 10.0**nd
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def _mmr_greedy_fn(k: int, lam: float):
    """applyInPandas greedy MMR selector over one group (columns ``__g``,
    ``__i``, ``rel``, ``v`` → ``__g``, ``__i``, ``mmr``, ``rank``).

    Incremental max-sim form: after each pick only sims against the picked
    vector are computed and folded into a running per-row max — O(k·n·dim)
    time and O(n·dim) memory per group, never an n×n similarity matrix, so
    group size is bounded by the vectors themselves (the applyInPandas
    floor), not by a quadratic intermediate. ``max`` of round-6 sims equals
    round-6 of the max, so this is value-identical to the pairwise form the
    DuckDB mirror uses.
    """
    onelam = 1.0 - lam

    def _greedy(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        ids = pdf["__i"].to_numpy()
        V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        norms = np.sqrt(np.einsum("ij,ij->i", V, V))
        maxsim = None  # max cosine vs the selected set; None ≡ empty set
        sel = np.zeros(n, dtype=bool)
        chosen: list[int] = []
        scores: list[float] = []
        for _ in range(min(k, n)):
            if maxsim is None:
                score = _round_half_up_np(lam * rel, 6)
            else:
                score = _round_half_up_np(lam * rel - onelam * maxsim, 6)
            masked = np.where(sel, -np.inf, score)
            best_val = masked.max()
            ties = np.nonzero(masked == best_val)[0]
            best = min(ties, key=lambda i: ids[i]) if len(ties) > 1 else ties[0]
            best = int(best)
            sel[best] = True
            chosen.append(best)
            scores.append(float(score[best]))
            simp = _round_half_up_np(V @ V[best] / (norms * norms[best]), 6)
            maxsim = simp if maxsim is None else np.maximum(maxsim, simp)
        return pd.DataFrame(
            {
                "__g": [pdf["__g"].iloc[0]] * len(chosen),
                "__i": [ids[i] for i in chosen],
                "mmr": scores,
                "rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
            }
        )

    return _greedy


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 5,
    fetch_r: int = 20,
    lam: float = 0.7,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-``k`` (Carbonell &
    Goldstein 1998): greedily pick, per query, the candidate maximizing
    ``lam * rel(q, c) - (1 - lam) * max_sim(c, selected)`` — the standard
    diversification stage over any retrieval tier, so near-duplicate
    neighbors don't crowd the result list. ``lam = 1`` degenerates to plain
    relevance rank; lower ``lam`` trades relevance for diversity.

    ``candidates`` is any tier's per-query top-R frame (``brute_force_topk``
    / ``ivf_topk`` / ``rerank_topk`` output — only (query_id, neighbor_id)
    is read); default is an exact brute-force top-``fetch_r``.

    Scale shape: the pool is |Q|·R rows built exactly like ``rerank_topk``
    (candidate ids and query vectors broadcast into the corpus scan — zero
    corpus shuffle); the inherently sequential greedy loop runs inside ONE
    ``applyInPandas`` pass, one group of R rows per query — O(k·R·dim) work
    per query, embarrassingly parallel across queries, no driver collect.

    Determinism across engines (the DuckDB mirror is a recursive CTE):
    relevance lands on Spark's round-6 grid before the pandas stage;
    pairwise sims and the composite score are re-rounded HALF_UP to the
    same grid (``_round_half_up_np``); every argmax tie-breaks on ascending
    neighbor id.
    """
    from pyspark.sql import types as T

    qid = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    if candidates is None:
        # fused candidate stage: score the corpus ONCE and carry the vector
        # through the top-R window — one corpus scan instead of the
        # brute-stage-then-rejoin pair (scan-audit: embeddings x4 -> x2).
        # Raw-cosine ordering with id tie-break = brute_force_topk's exact
        # candidate set (the proven embedding_topk oracle pair); the
        # staged select evaluates the fold once per row.
        scored = (
            c.crossJoin(F.broadcast(q))
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                cosine_sim(F.col("__qv"), F.col("__cv")).alias("__cos"),
                F.col("__cv"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("__cos").desc(), F.col("neighbor_id").asc()
        )
        pool = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= fetch_r)
            .select(
                F.col("query_id").alias("__g"),
                F.col("neighbor_id").alias("__i"),
                F.round(F.col("__cos"), 6).alias("rel"),
                F.col("__cv").alias("v"),
            )
        )
    else:
        cand = candidates.select("query_id", "neighbor_id")
        pool = (
            c.join(F.broadcast(cand), "neighbor_id")
            .join(F.broadcast(q), "query_id")
            .select(
                F.col("query_id").alias("__g"),
                F.col("neighbor_id").alias("__i"),
                F.round(cosine_sim(F.col("__qv"), F.col("__cv")), 6).alias("rel"),
                F.col("__cv").alias("v"),
            )
        )
    out_schema = T.StructType(
        [
            T.StructField("__g", pool.schema["__g"].dataType),
            T.StructField("__i", pool.schema["__i"].dataType),
            T.StructField("mmr", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    # slot-partition ahead of the Python-batched stage: AQE's size-based
    # coalescing would funnel the tiny pool into ONE post-shuffle
    # partition and serialize the per-group greedy (packing._slot_partitioned
    # rationale; user-specified counts are exempt from coalescing)
    from transmog_spark.operators.packing import _slot_partitioned

    return (
        _slot_partitioned(pool, "__g")
        .groupBy("__g")
        .applyInPandas(_mmr_greedy_fn(k, lam), schema=out_schema)
        .select(
            F.col("__g").alias("query_id"),
            F.col("__i").alias("neighbor_id"),
            "mmr",
            "rank",
        )
    )


def diverse_sample(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    nlist: int = 16,
    per_cell: int = 5,
    lam: float = 0.5,
    refine_iterations: int = 0,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Diverse representative sampling — SemDeDup's dual: instead of
    DROPPING near-duplicates inside each embedding cluster, PICK the
    ``per_cell`` most representative-yet-diverse members per cluster
    (greedy MMR with relevance = similarity to the cluster centroid,
    ``lam`` trading centrality for spread). The coreset-selection shape
    for training-data curation: a budgeted subset that covers the
    embedding space instead of oversampling its dense modes.

    Scale shape: one k-means assignment pass (``semdedup_assign`` — the
    same cached stage SemDeDup uses; pass ``assigned`` to share it), then
    ONE applyInPandas pass grouped by cluster. The greedy is the
    incremental max-sim form (O(k·s·dim) per cluster, no s×s matrix), so
    per-task memory is the cluster's vectors themselves — ``nlist`` is the
    knob that bounds cluster size, exactly as in SemDeDup.

    Output: (cluster_id, ``id_col``, mmr, rank) — ``rank`` 1..per_cell
    within each cluster; deterministic across runs, engines, and
    partitionings (round-6 grids, ascending-id tie-breaks).
    """
    from pyspark.sql import types as T

    if assigned is None:
        assigned = semdedup_assign(
            corpus, id_col=id_col, vec_col=vec_col, dim=dim, nlist=nlist,
            refine_iterations=refine_iterations,
        )
    pool = assigned.select(
        F.col("cluster_id").alias("__g"),
        F.col("vec_id").alias("__i"),
        F.col("cent_sim").alias("rel"),
        F.col("__cv").cast("array<double>").alias("v"),
    )
    out_schema = T.StructType(
        [
            T.StructField("__g", pool.schema["__g"].dataType),
            T.StructField("__i", pool.schema["__i"].dataType),
            T.StructField("mmr", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    from transmog_spark.operators.packing import _slot_partitioned

    return (
        _slot_partitioned(pool, "__g")
        .groupBy("__g")
        .applyInPandas(_mmr_greedy_fn(per_cell, lam), schema=out_schema)
        .select(
            F.col("__g").alias("cluster_id"),
            F.col("__i").alias(id_col),
            "mmr",
            "rank",
        )
    )


def _fold_norm(cv: list[float]) -> float:
    # EXACT mirror of cosine_sim's left fold (same IEEE op order) so the
    # plan-time constant equals what the engine would compute in-row
    import math

    acc = 0.0
    for x in cv:
        acc += x * x
    return math.sqrt(acc)


def _centroid_sim_structs(cents: list[tuple[int, list[float]]]):
    """Expression factory: vec -> array<struct(sim, -idx, cid)> over the
    centroid set as plan-time literals.

    array_max / sort_array compare fields left to right, so max = highest
    round(cos,6), ties broken by LOWEST cid (idx follows cid order) —
    identical keys to the oracle's row_number() OVER (ORDER BY sim DESC,
    cid ASC). ONE literal node per list (F.lit of whole arrays):
    per-element Literal trees and per-centroid lambda folds made Catalyst
    analysis (seconds per build) dominate the wall at small scale — a
    single transform over a 2D literal keeps the plan at 3 lambdas
    regardless of nlist.
    """
    cents_arr = F.lit([cv for _, cv in cents])
    norms_arr = F.lit([_fold_norm(cv) for _, cv in cents])
    cids_arr = F.lit([cid for cid, _ in cents])

    def sim_structs(vec: Column) -> Column:
        na = F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
        )

        def mk(cv: Column, i: Column) -> Column:
            dot = F.aggregate(
                F.zip_with(vec, cv, lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            nb = F.element_at(norms_arr, i + 1)
            sim = F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
            return F.struct(
                F.round(sim, 6).alias("s"),
                (-i).alias("negidx"),
                F.element_at(cids_arr, i + 1).alias("cid"),
            )

        return F.transform(cents_arr, mk)

    return sim_structs


def kmeans_refine(
    c: DataFrame,
    cents: list[tuple[int, list[float]]],
    *,
    dim: int,
    iterations: int,
    scale: int = 1_000_000,
) -> list[tuple[int, list[float]]]:
    """Lloyd refinement of IVF centroids, deterministic across engines.

    Each iteration: per-row argmax assignment over centroid literals (zero
    shuffle) -> per-list per-dimension mean via ``2 + dim`` map-side-combined
    aggregate expressions (``element_at`` — never a posexplode, which would
    be rows×dim exploded rows at corpus scale; same shape as
    ``sq8_params``). Sums are exact scaled integers (``round(v·1e6)`` as
    long), so the means are independent of partition order and
    bit-reproducible in the DuckDB oracle — floating-point summation order
    can never flip an assignment between engines. A list that captures no
    points keeps its previous centroid. ``dim`` is explicit for the same
    reason as everywhere else: probing an array column's length would be a
    driver action on a 10^12-row table.

    The per-iteration collect is ``nlist × (dim + 1)`` longs — bounded and
    tiny, the same class as the seed-centroid collect in ``ivf_topk``.
    """
    for _ in range(iterations):
        sim_structs = _centroid_sim_structs(cents)
        assigned = c.withColumn("__cid", F.array_max(sim_structs(F.col("__cv")))["cid"])
        # cast double BEFORE scaling: float32 × int would round in float32
        # and can land on a different integer than the oracle's DOUBLE[] math
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(
                F.round(F.element_at(F.col("__cv"), i + 1).cast("double") * scale).cast("long")
            ).alias(f"__s{i}")
            for i in range(dim)
        ]
        rows = assigned.groupBy("__cid").agg(*aggs).collect()
        by_cid = {r["__cid"]: r for r in rows}
        new_cents = []
        for cid, cv in cents:
            r = by_cid.get(cid)
            if r is None:
                new_cents.append((cid, cv))  # empty list keeps its centroid
            else:
                denom = r["__n"] * float(scale)
                new_cents.append((cid, [r[f"__s{i}"] / denom for i in range(dim)]))
        cents = new_cents
    return cents


def _seed_centroids(c: DataFrame, id_name: str, nlist: int) -> list[tuple[int, list[float]]]:
    """``nlist`` deterministic seed centroids: the vectors of the rows with
    the smallest md5 hash of their id — no RNG, bit-reproducible in the
    DuckDB oracle. TakeOrdered (per-partition top-k + driver merge, no
    total sort); the frame ``c`` must carry (``id_name``, ``__cv``)."""
    from transmog_spark.functions.hashing import md5_long

    rows = (
        c.orderBy(md5_long(F.col(id_name).cast("string")).asc(), F.col(id_name).asc())
        .limit(nlist)
        .collect()
    )
    return sorted(
        ((r[id_name], [float(x) for x in r["__cv"]]) for r in rows),
        key=lambda t: t[0],
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
    refine_iterations: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into ``nlist`` inverted lists
    around deterministic centroids; probe the ``nprobe`` nearest lists.

    Seed centroids are the vectors of the ``nlist`` corpus rows with the
    smallest md5 hash of their id — no RNG, bit-reproducible in the DuckDB
    oracle. ``refine_iterations > 0`` runs that many Lloyd k-means passes
    over the seeds (``kmeans_refine``; requires explicit ``dim``) for
    better list balance/recall; list assignment and probing are identical
    either way.

    Scale shape: centroid set is tiny (broadcast); corpus assignment is one
    narrow pass + rank; the query-side join touches ``nprobe/nlist`` of the
    corpus instead of all of it. Similarities are ranked on round(cos, 6)
    with id tie-breaks so both engines order identically.
    """
    qid = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    # Centroid selection is a TakeOrdered; the nlist rows are tiny and
    # become plan-time literals — so list assignment below is a pure
    # per-row expression.
    cents = _seed_centroids(c, "neighbor_id", nlist)
    if refine_iterations > 0:
        if dim is None:
            raise ValueError("refine_iterations requires explicit dim")
        cents = kmeans_refine(c, cents, dim=dim, iterations=refine_iterations)

    sim_structs = _centroid_sim_structs(cents)

    # corpus→list assignment: expression argmax over centroid literals —
    # ZERO shuffle (the old formulation cross-joined nlist copies of the
    # corpus through a row_number window, i.e. a full corpus exchange)
    assigned = c.withColumn("__cid", F.array_max(sim_structs(F.col("__cv")))["cid"])

    # query→probe lists: top-nprobe centroids per query, same expression
    # form (sort_array desc on the same struct keys), then explode
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    top_cids = F.transform(
        F.slice(F.sort_array(sim_structs(F.col("__qv")), asc=False), 1, nprobe),
        lambda st: st["cid"],
    )
    probes = q.select("query_id", "__qv", F.explode(top_cids).alias("__cid"))

    # probe side is |queries|×nprobe rows — broadcast it so the corpus never
    # shuffles (nlist distinct __cid values would make a terrible hash key)
    joined = assigned.join(F.broadcast(probes), "__cid")
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def sq8_params(corpus: DataFrame, vec_col: str, *, dim: int) -> tuple[list[float], list[float]]:
    """Per-dimension (min, span) for scalar int8 quantization, computed in
    ONE map-side-combined pass (2·dim aggregate expressions over
    element_at — never a posexplode, which would be rows×dim exploded rows
    at corpus scale). Constant dimensions get span=1.0 (codes collapse to
    -128 and dequantize exactly to the constant)."""
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.element_at(F.col(vec_col), i + 1)).alias(f"mn{i}"))
        aggs.append(F.max(F.element_at(F.col(vec_col), i + 1)).alias(f"mx{i}"))
    row = corpus.agg(*aggs).collect()[0]
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    spans = [
        float(row[f"mx{i}"]) - float(row[f"mn{i}"]) or 1.0 for i in range(dim)
    ]
    return mins, spans


def sq8_quantize(
    df: DataFrame,
    vec_col: str,
    mins: list[float],
    spans: list[float],
    *,
    codes_col: str = "codes",
) -> DataFrame:
    """int8 codes: round((x-min)/span*255)-128 per dimension — 4× smaller
    corpus storage/scan than float32 (the FAISS SQ8 trade); dequantization
    error is bounded by span/510 per dimension."""
    mins_arr, spans_arr = F.lit(mins), F.lit(spans)
    codes = F.transform(
        F.col(vec_col),
        lambda x, i: (
            F.round(
                (x.cast("double") - F.element_at(mins_arr, i + 1))
                / F.element_at(spans_arr, i + 1)
                * 255.0
            )
            - 128
        ).cast("int"),
    )
    return df.withColumn(codes_col, codes)


def sq8_dequantize(codes: Column, mins: list[float], spans: list[float]) -> Column:
    mins_arr, spans_arr = F.lit(mins), F.lit(spans)
    return F.transform(
        codes,
        lambda c, i: F.element_at(mins_arr, i + 1)
        + (c + 128).cast("double") * F.element_at(spans_arr, i + 1) / 255.0,
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    dim: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k against an int8-quantized corpus: queries
    stay full precision, corpus vectors are scored from their dequantized
    codes. Same broadcast-queries single-pass shape as brute_force_topk but
    the corpus side reads 4× fewer bytes once codes are materialized."""
    qid = query_id_col or id_col
    mins, spans = sq8_params(corpus, vec_col, dim=dim)
    c = sq8_quantize(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        mins,
        spans,
    ).select("neighbor_id", sq8_dequantize(F.col("codes"), mins, spans).alias("__dv"))
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("__qv"), F.col("__dv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 3,
    dim: int,
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k via hyperplane LSH buckets with multi-probe.

    Probe 0 is the query's own bucket; probes 1..n flip one signature bit
    (nearest Hamming neighbors), boosting recall without touching the
    corpus side's single signature pass.

    ``dim`` (embedding dimensionality) is explicit: hyperplane weights are
    plan-time literals of that length, and array columns don't carry a
    length in the schema — probing a row for it would be a driver-side
    action on a 10^12-row table.

    Ranking keys are round(cosine, 6) with neighbor-id tie-breaks so the
    DuckDB oracle orders identically; output cosine is round(·, 4).
    """
    qid = query_id_col or id_col

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    c = c.withColumn("__bkey", _hyperplane_signature(F.col("__cv"), dim, n_planes))

    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    q = q.withColumn("__sig", _hyperplane_signature(F.col("__qv"), dim, n_planes))
    # probe list unrolls at plan time (shift amounts must be literals):
    # own bucket + the buckets one signature-bit away
    probes = F.array_distinct(
        F.array(
            F.col("__sig"),
            *[
                F.col("__sig").bitwiseXOR(F.lit(1 << p).cast("long"))
                for p in range(max(0, min(n_probes - 1, n_planes)))
            ],
        )
    )
    q = q.select("query_id", "__qv", F.explode(probes).alias("__bkey"))

    # Explicit broadcast of the probe side (queries are small by contract,
    # like ivf_topk's probe set): without it, a declined auto-broadcast
    # hash-partitions the 10^12-row corpus on __bkey — at most 2^n_planes
    # distinct values, a catastrophic shuffle key.
    joined = c.join(F.broadcast(q), "__bkey")
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("__qv"), F.col("__cv")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def semdedup_assign(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    nlist: int = 16,
    refine_iterations: int = 0,
) -> DataFrame:
    """SemDeDup stage 1: train/refine centroids and assign every vector —
    (vec_id, __cv, cluster_id, cent_sim). Persist the result when running
    ``semdedup`` (it feeds three consumers) or when sweeping several
    ``threshold`` values over one assignment."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    cents = _seed_centroids(c, "vec_id", nlist)
    if refine_iterations > 0:
        cents = kmeans_refine(c, cents, dim=dim, iterations=refine_iterations)
    sim_structs = _centroid_sim_structs(cents)

    # both fields come from ONE array_max expression in ONE select — the
    # collapsed Project holds two GetStructField over identical children
    # and whole-stage codegen's subexpression elimination evaluates the
    # nlist×dim argmax once per row
    best = F.array_max(sim_structs(F.col("__cv")))
    return c.select(
        "vec_id",
        "__cv",
        best["cid"].alias("cluster_id"),
        best["s"].alias("cent_sim"),
    )


def semdedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    nlist: int = 16,
    refine_iterations: int = 0,
    threshold: float = 0.95,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Semantic dedup over an embedding column (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space into ``nlist`` clusters,
    then inside each cluster treat every pair with cosine >= ``threshold``
    as semantic duplicates and keep the member with the LOWEST similarity
    to its centroid (the paper's keep rule — low-centroid-similarity
    examples are the informative ones), ids breaking exact ties.

    Returns one row per input vector: (``id_col``, cluster_id, cent_sim,
    keep) with keep ∈ {0, 1} — a verdict table, so callers filter the
    corpus with one semi-join and the drop decision stays auditable.

    Precisely: a vector x is dropped iff some y in the same cluster has
    round(cos(x, y), 6) >= threshold and (cent_sim(y), id(y)) <
    (cent_sim(x), id(x)) lexicographically. Survivors are the local minima
    of cent_sim within their >= threshold neighborhood — at least one
    member of every duplicate group survives, and the rule needs no
    transitive closure (single self-join, no iteration).

    Scale shape: centroid seeding/refinement is the bounded ``ivf_topk`` /
    ``kmeans_refine`` machinery (nlist×(dim+1) longs on the driver);
    cluster assignment is a zero-shuffle expression argmax over centroid
    literals; the pairwise pass is strictly cluster-local — one hash
    shuffle of (id, vector) on cluster_id, reused for both self-join sides.
    ``nlist`` is the scale knob: SemDeDup's own regime is cluster sizes in
    the low thousands (nlist ≈ n/4k), which bounds the quadratic term per
    cluster; work is O(Σ sᵢ²·dim) across clusters, never corpus². A 100 TB
    caller should persist/checkpoint the assignment frame — it feeds the
    self-join twice (exchange-reused) plus the verdict join (recomputed
    here; at bench scale the triple branch is cheaper than a persist).

    Determinism: assignment and cent_sim use the same round(·, 6) struct
    keys as ``ivf_topk`` (lowest-cid ties), pair similarity rounds to 6
    before the threshold — every comparison resolves identically in the
    DuckDB mirror (``oracle.semdedup_sql``).

    Pass a precomputed (ideally persisted) ``assigned`` frame from
    ``semdedup_assign`` to skip centroid training AND keep the
    argmax-over-literals expression at one evaluation: the assignment
    feeds three consumers here (both self-join sides + the verdict join),
    and each re-derivation re-runs both the nlist×dim per-row argmax and
    Catalyst's analysis of its literal tree — persisting it measures
    ~1.8× on the whole verdict at bench scale.
    """
    if assigned is None:
        assigned = semdedup_assign(
            corpus, id_col=id_col, vec_col=vec_col, dim=dim, nlist=nlist,
            refine_iterations=refine_iterations,
        )

    # Per-pair work minimized (guide §1.2 "per-task work"): each side
    # precomputes its vector NORM once per row — cosine_sim would refold
    # both norms per PAIR (3 full-dim folds/pair instead of 1).  The fold
    # is the exact expression cosine_sim uses, so dot/(nx·ny) is
    # IEEE-identical to the original cosine_sim(x, y).
    def _norm(vec: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                vec, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
            )
        )

    x = assigned.select(
        F.col("vec_id").alias("__xid"), F.col("__cv").alias("__xv"),
        "cluster_id", F.col("cent_sim").alias("__xs"),
        _norm(F.col("__cv")).alias("__xn"),
    )
    y = assigned.select(
        F.col("vec_id").alias("__yid"), F.col("__cv").alias("__yv"),
        "cluster_id", F.col("cent_sim").alias("__ys"),
        _norm(F.col("__cv")).alias("__yn"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("__xv"), F.col("__yv"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pair_sim = F.when(
        (F.col("__xn") > 0) & (F.col("__yn") > 0),
        dot / (F.col("__xn") * F.col("__yn")),
    ).otherwise(F.lit(0.0))
    dropped = (
        x.join(y, "cluster_id")
        # the cheap lexicographic keep-rule predicate FIRST: it keeps
        # exactly the ordered half of each pair (strict <, so it also
        # implies xid != yid) and halves the full-dim dot evaluations
        .where(
            (F.col("__ys") < F.col("__xs"))
            | ((F.col("__ys") == F.col("__xs")) & (F.col("__yid") < F.col("__xid")))
        )
        .where(F.round(pair_sim, 6) >= threshold)
        .select(F.col("__xid").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("__dup", F.lit(1)), "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            "cluster_id",
            "cent_sim",
            F.when(F.col("__dup").isNull(), 1).otherwise(0).cast("int").alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# product quantization (PQ)
# --------------------------------------------------------------------------

def _sub_dist_structs(cents_s: list[list[float]], offset: int, d0: int):
    """Expression factory for one PQ subspace: vec -> array<struct(d, j)>
    of scaled-integer squared-L2 distances to the subspace codebook.

    Distances are exact integers — sum of round((x−c)²·1e12) longs — so
    argmin assignment, ADC ranking, and every tie resolve bit-identically
    in the DuckDB mirror regardless of summation order (same trick as
    kmeans_refine's scaled-integer means). array_min picks (lowest d,
    lowest j)."""
    cents_arr = F.lit(cents_s)  # ksub × d0 literal

    def dist_structs(vec: Column) -> Column:
        sub = F.slice(vec, offset + 1, d0)

        def mk(cv: Column, j: Column) -> Column:
            d = F.aggregate(
                F.zip_with(
                    sub,
                    cv,
                    lambda x, y: F.round(
                        (x.cast("double") - y) * (x.cast("double") - y) * 1e12
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            return F.struct(d.alias("d"), j.cast("int").alias("j"))

        return F.transform(cents_arr, mk)

    return dist_structs


def pq_train(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    m: int = 8,
    ksub: int = 256,
    refine_iterations: int = 1,
    scale: int = 1_000_000,
) -> list[list[list[float]]]:
    """Train PQ codebooks (Jégou et al. 2011, TPAMI "Product Quantization
    for Nearest Neighbor Search"): split ``dim`` into ``m`` subspaces of
    dim/m and run an independent ``ksub``-centroid Lloyd k-means in each.

    Seeds are the subvector slices of the ``ksub`` corpus rows with the
    smallest md5(id) — the ANN family's deterministic seeding, one
    TakeOrdered collect shared by all subspaces. Assignment uses the
    scaled-integer L2 keys of ``_sub_dist_structs``; means are exact
    scaled-integer sums (round(v·1e6) longs), so the codebooks are
    bit-reproducible in the DuckDB oracle. Per iteration this runs ``m``
    bounded aggregations (ksub×(d0+1) longs each on the driver) — train on
    a hash-sampled frame at corpus scale (FAISS's own posture: codebooks
    come from a sample, encoding streams over everything).
    """
    if dim % m:
        raise ValueError("dim must divide evenly into m subspaces")
    d0 = dim // m
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    seeds = _seed_centroids(c, "vec_id", ksub)
    books = [
        [cv[s * d0 : (s + 1) * d0] for _, cv in seeds] for s in range(m)
    ]
    for _ in range(refine_iterations):
        new_books = []
        for s in range(m):
            ds = _sub_dist_structs(books[s], s * d0, d0)
            assigned = c.withColumn("__j", F.array_min(ds(F.col("__cv")))["j"])
            aggs = [F.count(F.lit(1)).alias("__n")] + [
                F.sum(
                    F.round(
                        F.element_at(F.col("__cv"), s * d0 + i + 1).cast("double")
                        * scale
                    ).cast("long")
                ).alias(f"__s{i}")
                for i in range(d0)
            ]
            rows = assigned.groupBy("__j").agg(*aggs).collect()
            by_j = {r["__j"]: r for r in rows}
            book = []
            for j, cv in enumerate(books[s]):
                r = by_j.get(j)
                if r is None:
                    book.append(cv)  # empty cell keeps its centroid
                else:
                    denom = r["__n"] * float(scale)
                    book.append([r[f"__s{i}"] / denom for i in range(d0)])
            new_books.append(book)
        books = new_books
    return books


def ivfpq_train(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 256,
    coarse_refine_iterations: int = 0,
    pq_refine_iterations: int = 1,
) -> tuple[list[tuple[int, list[float]]], list[list[list[float]]]]:
    """Train the IVFPQ model once → (coarse centroids, residual PQ
    codebooks) — FAISS's train/add/search separation: train on a (sampled)
    corpus, then encode/search any number of times without repeating the
    bounded driver aggregations. Pass the tuple to ``ivfpq_topk(model=…)``."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    cents = _seed_centroids(c, "neighbor_id", nlist)
    if coarse_refine_iterations > 0:
        cents = kmeans_refine(c, cents, dim=dim, iterations=coarse_refine_iterations)
    cents_arr = F.lit([cv for _, cv in cents])
    sim_structs = _centroid_sim_structs(cents)
    best = F.array_max(sim_structs(F.col("__cv")))
    residual = F.zip_with(
        F.col("__cv"),
        F.element_at(cents_arr, ((-best["negidx"]) + 1).cast("int")),
        lambda x, y: x.cast("double") - y,
    )
    res = c.select("neighbor_id", residual.alias("__rv"))
    books = pq_train(
        res, id_col="neighbor_id", vec_col="__rv", dim=dim, m=m, ksub=ksub,
        refine_iterations=pq_refine_iterations,
    )
    return cents, books


def ivfpq_encode(
    corpus: DataFrame,
    model: tuple[list[tuple[int, list[float]]], list[list[list[float]]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
) -> DataFrame:
    """IVFPQ "add" stage: encode the corpus against a trained model →
    (neighbor_id, __cid, __codes) — the m-bytes-plus-list-id frame a
    deployment persists. Feeding a persisted result to
    ``ivfpq_topk(encoded=…)`` drops the assignment/residual/argmin subtree
    (the largest literal expression tree in the engine) from every query's
    plan: search then pays only probes + ADC, measured ~2× on both plan
    analysis and execution at bench scale."""
    cents, books = model
    m = len(books)
    d0 = dim // m
    cents_arr = F.lit([cv for _, cv in cents])
    sim_structs = _centroid_sim_structs(cents)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    best = F.array_max(sim_structs(F.col("__cv")))
    residual = F.zip_with(
        F.col("__cv"),
        F.element_at(cents_arr, ((-best["negidx"]) + 1).cast("int")),
        lambda x, y: x.cast("double") - y,
    )
    res = c.select("neighbor_id", best["cid"].alias("__cid"), residual.alias("__rv"))
    subs = [_sub_dist_structs(books[s], s * d0, d0) for s in range(m)]
    codes = F.array(*[F.array_min(subs[s](F.col("__rv")))["j"] for s in range(m)])
    return res.select("neighbor_id", "__cid", codes.alias("__codes"))


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    dim: int,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 256,
    coarse_refine_iterations: int = 0,
    pq_refine_iterations: int = 1,
    exclude_self: bool = True,
    model: tuple[list[tuple[int, list[float]]], list[list[list[float]]]]
    | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """IVF + PQ composition (FAISS ``IndexIVFPQ``; Jégou et al. 2011 §V):
    a coarse ``nlist``-centroid quantizer routes each vector to an inverted
    list, and the *residual* (vector − coarse centroid) is product-quantized
    to ``m`` codebook indices. Queries probe the ``nprobe`` nearest lists
    and score candidates by ADC between the query's per-list residual and
    the candidate's reconstructed residual centroid.

    Why residuals: within a list the residual energy is much smaller than
    the raw vectors', so the same ksub codebook budget quantizes finer —
    the reason IVFPQ beats flat PQ at equal bytes.

    Determinism: the coarse tier is the exact ``ivf_topk`` machinery
    (md5-seeded centroids, round(cos,6)+cid argmax keys); residuals are
    plain double subtractions of plan-time centroid literals, so both
    engines hold bit-identical residual vectors; the PQ tier is
    ``pq_train``'s scaled-integer L2 (every assignment/ADC key an exact
    BIGINT). Ranks and ties match the DuckDB mirror exactly.

    Scale shape: centroids and codebooks are tiny plan-time literals;
    corpus assignment + residual + encoding is one zero-shuffle map pass
    (the (cid, codes) pair is what a deployment persists — m bytes + a
    list id per vector); the probe join is broadcast on the query side and
    touches ~nprobe/nlist of the corpus; training aggregations are the
    bounded kmeans_refine shape (ksub×(dim/m+1) longs per subspace on the
    driver). At 100 TB, train codebooks on a hash-sampled frame and persist
    the encoded corpus — FAISS's own posture.
    """
    if dim % m:
        raise ValueError("dim must divide evenly into m subspaces")
    d0 = dim // m
    qid = query_id_col or id_col

    if model is None:
        model = ivfpq_train(
            corpus, id_col=id_col, vec_col=vec_col, dim=dim, nlist=nlist,
            m=m, ksub=ksub, coarse_refine_iterations=coarse_refine_iterations,
            pq_refine_iterations=pq_refine_iterations,
        )
    cents, books = model
    cents_arr = F.lit([cv for _, cv in cents])  # idx order == cents order
    sim_structs = _centroid_sim_structs(cents)

    # coarse assignment + residual + PQ codes (FAISS "add"): one narrow
    # map pass; pass a persisted ``encoded`` frame to keep this subtree
    # out of the query plan entirely
    if encoded is None:
        encoded = ivfpq_encode(
            corpus, model, id_col=id_col, vec_col=vec_col, dim=dim
        )

    # query probes: top-nprobe coarse lists; each probe row carries the
    # query residual w.r.t. THAT list's centroid (true IVFPQ ADC)
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    probe_structs = F.slice(F.sort_array(sim_structs(F.col("__qv")), asc=False), 1, nprobe)
    probes = q.select("query_id", "__qv", F.explode(probe_structs).alias("__p"))
    pidx = -F.col("__p")["negidx"]
    qres = F.zip_with(
        F.col("__qv"),
        F.element_at(cents_arr, (pidx + 1).cast("int")),
        lambda x, y: x.cast("double") - y,
    )
    probes = probes.select(
        "query_id", F.col("__p")["cid"].alias("__cid"), qres.alias("__qr")
    )

    joined = encoded.join(F.broadcast(probes), "__cid")
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))

    score = None
    for s in range(m):
        book_arr = F.lit(books[s])
        cent = F.element_at(book_arr, F.element_at(F.col("__codes"), s + 1) + 1)
        sub = F.slice(F.col("__qr"), s * d0 + 1, d0)
        ds = F.aggregate(
            F.zip_with(
                sub,
                cent,
                lambda x, y: F.round((x - y) * (x - y) * 1e12).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        score = ds if score is None else score + ds
    scored = joined.select("query_id", "neighbor_id", score.alias("__score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__score").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__score") / 1e12, 4).alias("dist2"),
            "rank",
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    dim: int,
    m: int = 8,
    ksub: int = 256,
    refine_iterations: int = 1,
    exclude_self: bool = True,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate L2 top-k against a product-quantized corpus.

    Each corpus vector compresses to ``m`` codebook indices (m bytes at
    ksub<=256 — a 32× reduction on dim=64 float32); queries stay full
    precision and score candidates by asymmetric distance (ADC): the sum
    over subspaces of the exact scaled-integer squared-L2 between the
    query slice and the candidate's reconstructed centroid. Integer score
    keys rank identically in the DuckDB oracle; ``dist2`` is the score
    descaled to a float for humans.

    Scale shape: codebooks are tiny plan-time literals; encoding is a
    zero-shuffle map pass (the codes column is what a real deployment
    persists); scoring is the broadcast-queries single-pass shape of
    ``sq8_topk`` with 4×(dim/m-fold fewer) corpus bytes in flight. Pass
    ``books`` from ``pq_train`` on a sample to skip training here.
    """
    if dim % m:
        raise ValueError("dim must divide evenly into m subspaces")
    d0 = dim // m
    qid = query_id_col or id_col
    if books is None:
        books = pq_train(
            corpus, id_col=id_col, vec_col=vec_col, dim=dim, m=m, ksub=ksub,
            refine_iterations=refine_iterations,
        )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    subs = [_sub_dist_structs(books[s], s * d0, d0) for s in range(m)]
    codes = F.array(*[F.array_min(subs[s](F.col("__cv")))["j"] for s in range(m)])
    encoded = c.select("neighbor_id", codes.alias("__codes"))

    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    joined = encoded.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))

    # ADC: reconstruct each candidate's centroid per subspace from the
    # literal codebook and fold the scaled-integer squared-L2 to the query
    score = None
    for s in range(m):
        book_arr = F.lit(books[s])
        cent = F.element_at(book_arr, F.element_at(F.col("__codes"), s + 1) + 1)
        sub = F.slice(F.col("__qv"), s * d0 + 1, d0)
        ds = F.aggregate(
            F.zip_with(
                sub,
                cent,
                lambda x, y: F.round(
                    (x.cast("double") - y) * (x.cast("double") - y) * 1e12
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        score = ds if score is None else score + ds
    scored = joined.select("query_id", "neighbor_id", score.alias("__score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__score").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__score") / 1e12, 4).alias("dist2"),
            "rank",
        )
    )


def retrieval_metrics(
    approx: DataFrame,
    exact: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Rank-aware retrieval quality per query: MRR and NDCG@k of an
    approximate tier against exact ground truth (binary relevance =
    membership in the exact top-k), completing the eval kit next to
    ``retrieval_recall``'s set-level view — two tiers with equal recall
    can rank the hits very differently, and the reciprocal-rank /
    discounted-gain numbers are what a retrieval deployment actually
    tracks.

    Exactness: the position discounts 1/rank and 1/log2(rank+1) are
    irrational, so both engines score on PLAN-TIME integer weight grids —
    w_mrr[r] = round(1e6/r), w_dcg[r] = round(1e6/log2(r+1)) computed in
    Python once and shipped as array literals to BOTH the Spark plan and
    the DuckDB mirror; per-query sums are exact BIGINTs, final divisions
    round-4. IDCG@k uses the first min(n_exact, k) DCG weights. A query
    whose approx list has no relevant hit scores mrr = 0, ndcg = 0; ranks
    beyond ``k`` contribute nothing (the @k cutoff).

    Scale shape: |Q|·k rows both sides, one equi-join on (query,
    neighbor), one map-side-combined groupBy — the corpus never enters.
    ``approx`` must carry its tier's 1-based ``rank_col`` (every tier in
    this engine emits one); duplicate (query, neighbor) rows keep their
    best rank first (min), so multi-probe tiers don't double-count.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w_mrr = [round(1_000_000 / r) for r in range(1, k + 1)]
    import math

    w_dcg = [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]
    idcg_prefix = [0]
    for w in w_dcg:
        idcg_prefix.append(idcg_prefix[-1] + w)

    ap = (
        approx.select(
            F.col(query_col), F.col(id_col), F.col(rank_col).cast("int").alias("__r")
        )
        .groupBy(query_col, id_col)
        .agg(F.min("__r").alias("__r"))
        .where(F.col("__r") <= k)
    )
    ex = exact.select(F.col(query_col), F.col(id_col)).distinct()
    arr_mrr = F.array(*[F.lit(w) for w in w_mrr])
    arr_dcg = F.array(*[F.lit(w) for w in w_dcg])
    arr_idcg = F.array(*[F.lit(w) for w in idcg_prefix[1:]])
    j = ex.join(ap, [query_col, id_col], "left")
    return (
        j.groupBy(query_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("__r").cast("long").alias("n_hit"),
            # element_at(arr, NULL) returns the LAST element in Spark 4
            # (NULL index behaves like -1), NOT NULL — every miss row would
            # silently add the final weight without the isNotNull guard
            F.coalesce(
                F.max(
                    F.when(
                        F.col("__r").isNotNull(),
                        F.element_at(arr_mrr, F.col("__r")),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("__best"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__r").isNotNull(),
                        F.element_at(arr_dcg, F.col("__r")),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("__dcg"),
        )
        .select(
            F.col(query_col),
            "n_exact",
            "n_hit",
            F.round(F.col("__best") / 1_000_000, 4).alias("mrr"),
            F.round(
                F.col("__dcg")
                / F.element_at(arr_idcg, F.least(F.col("n_exact"), F.lit(k)).cast("int")),
                4,
            ).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-corpus QA telemetry: per-group centroid drift + outlier screen
# ---------------------------------------------------------------------------

def _centroid_sums(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    *,
    scale: int = 1_000_000,
):
    """Per-group EXACT per-dimension scaled-integer component sums (the
    kmeans_refine centroid idiom): one posexplode -> one map-side-combined
    (group, dim) aggregation -> per-group ordered rebuild. Returns
    (group_col, __cs: array<long>, n_vecs). Cosine is scale-invariant, so
    the INTEGER sum vector stands in for the mean vector in every cosine
    downstream — no division, no float centroid, bit-identical on both
    engines."""
    ex = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("__d", "__x")
    )
    sums = ex.groupBy(group_col, "__d").agg(
        F.sum(
            F.round(F.col("__x").cast("double") * scale).cast("long")
        ).alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    return sums.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__d", "__s"))),
            lambda s: s["__s"],
        ).alias("__cs"),
        F.max("__n").alias("n_vecs"),
    )


def embedding_group_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group embedding drift report — the "is this source semantically
    where the rest of the corpus is" screen run before mixing/indexing a
    new dump: (group, n_vecs, cos_to_global, drift = 1 - cos). A group
    whose centroid swings away from the global centroid signals a scraped
    source gone off-domain (or an embedding-model version mismatch).

    Exactness: centroids are scaled-integer component sums (see
    ``_centroid_sums``), the global centroid is their per-dim total, and
    the cosine runs on the integer vectors directly (scale-invariance),
    rounded to 6 — the engine/oracle parity grid every ANN tier uses.

    Scale shape: ONE corpus explode into a (group, dim)-keyed partial agg;
    everything after is |groups| x dim rows; the global frame is one row,
    broadcast by construction.
    """
    cent = _centroid_sums(df, vec_col, group_col, scale=scale)
    # per-dim global sums: re-derive from the group frame (groups x dim
    # rows) so the corpus is scanned exactly once
    gsum = (
        cent.select(F.posexplode("__cs").alias("__d", "__s"))
        .groupBy("__d")
        .agg(F.sum("__s").alias("__gs"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__d", "__gs"))),
                lambda s: s["__gs"],
            ).alias("__gcs")
        )
    )
    from transmog_spark.operators.dedup import cosine_sim

    out = cent.crossJoin(F.broadcast(gsum))
    cos = F.round(cosine_sim(F.col("__cs"), F.col("__gcs")), 6)
    return out.select(
        F.col(group_col),
        "n_vecs",
        cos.alias("cos_to_global"),
        F.round(1 - cos, 6).alias("drift"),
    )


def embedding_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    *,
    scale: int = 1_000_000,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Within-group embedding outlier screen — the corrupt-vector /
    mislabeled-document filter run before an embedding corpus feeds ANN
    indexing or SemDeDup: per vector, cosine to its OWN group centroid
    (vector included in the centroid — the standard population form),
    z-scored against the group's cosine distribution. is_outlier flags
    z <= -z_threshold (low similarity only: unusually typical vectors are
    not a defect).

    Exactness: cosines land on the round-6 grid, then z-statistics run on
    the 1e6 scaled-integer grid (exact BIGINT/DECIMAL sums; mu = sc/n,
    var = ss/n - mu^2, sigma = sqrt(var) — spelled identically in the
    DuckDB mirror), z rounded to 4 and thresholded on the rounded value.
    Groups with one member or zero variance yield NULL z and never flag.

    Scale shape: the ``_centroid_sums`` explode pass + ONE broadcast join
    of the |groups| centroid frame back to the corpus + one
    (group)-keyed stats agg (|groups| rows) broadcast back again — the
    corpus itself never shuffles.
    """
    from transmog_spark.operators.dedup import cosine_sim

    cent = _centroid_sums(df, vec_col, group_col, scale=scale)
    scored = df.join(F.broadcast(cent.select(group_col, "__cs")), group_col)
    # round(cos * 1e6) -> exact long grid (NOT round(cos,6)*1e6, whose
    # float product can land a hair under the integer and truncate)
    c6 = F.round(cosine_sim(F.col(vec_col), F.col("__cs")) * 1_000_000).cast(
        "long"
    )
    scored = scored.select(
        F.col(id_col), F.col(group_col), c6.alias("__c6")
    )
    stats = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__c6").cast("decimal(38,0)")).alias("__sc"),
        F.sum(
            (F.col("__c6") * F.col("__c6")).cast("decimal(38,0)")
        ).alias("__ss"),
    )
    j = scored.join(F.broadcast(stats), group_col)
    mu = F.col("__sc").cast("double") / F.col("__n")
    var = F.col("__ss").cast("double") / F.col("__n") - mu * mu
    sigma = F.sqrt(var)
    z = F.when(
        (F.col("__n") > 1) & (sigma > 0),
        F.round((F.col("__c6") - mu) / sigma, 4),
    )
    return j.select(
        F.col(id_col),
        F.col(group_col),
        F.round(F.col("__c6") / 1_000_000, 6).alias("cos_centroid"),
        z.alias("z"),
        F.coalesce(z <= F.lit(-z_threshold), F.lit(False)).alias("is_outlier"),
    )


def jl_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    out_dim: int = 16,
    seed: str = "jl",
    scale: int = 1_000_000,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection — dimensionality reduction
    for embedding pipelines (cheaper ANN candidate generation, sketch
    columns, privacy-lossy exports) with the JL distance-preservation
    guarantee. The projection matrix is RADEMACHER ±1 signs drawn from a
    seeded hash per (input_dim, output_dim) cell (Achlioptas 2003 shows
    ±1 suffices) — no trained artifact to ship: both engines regenerate
    the identical matrix from the seed.

    Exactness: components are scaled to the 1e6 integer grid FIRST
    (round(x·scale) as BIGINT), and each output coordinate is an exact
    signed integer sum — zero float arithmetic anywhere, so the mirror is
    bit-identical, not round-tolerant. Downstream cosine/L2 on the
    projected vectors divides the scale away.

    ``dim`` must be given explicitly (plan-time sign arrays are unrolled
    per output coordinate — out_dim arrays of dim literals, the IVF/PQ
    centroid-literal idiom). Scale shape: one narrow map pass, zero
    shuffle, no UDF.

    Output: (id, proj: array<long> of length out_dim, in the input
    scale·component units).
    """
    if out_dim < 1 or dim < 1:
        raise ValueError("dim and out_dim must be >= 1")
    import hashlib

    def _h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sign_arrays = []
    for j in range(out_dim):
        signs = [
            1 if _h(f"{seed}#{i}#{j}") % 2 == 0 else -1 for i in range(dim)
        ]
        sign_arrays.append(signs)

    xi = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("long"),
    )
    staged = df.select(F.col(id_col), xi.alias("__xi"))
    comps = [
        F.aggregate(
            F.zip_with(
                F.col("__xi"),
                F.array(*[F.lit(s) for s in sign_arrays[j]]),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        for j in range(out_dim)
    ]
    return staged.select(F.col(id_col), F.array(*comps).alias("proj"))


def cosine_spectrum(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    strides: tuple[int, ...] = (1, 7, 101),
    bucket_width: float = 0.05,
) -> DataFrame:
    """Pairwise cosine-spectrum histogram — the corpus ISOTROPY diagnostic
    this engine's own ANN analyses lean on (BENCH/ann.md: a flat spectrum
    means no cluster structure, so IVF/PQ/JL candidate tiers pay their
    information-theoretic floor; a multi-modal spectrum means bucketing
    tiers will work). Run it BEFORE choosing an index tier or a SemDeDup
    threshold.

    Sampling is deterministic id-shift pairing — vector k pairs with
    k + stride for each configured stride — so the sample is O(n·|strides|)
    pairs (never the n² matrix), reproducible on any cluster size, and
    stride diversity breaks any id-locality correlation. Cosines land on
    the round-6 grid, then bucket on EXACT integers (floor(c6 / w6) with
    w6 = bucket_width·1e6) — engine-identical bucketing with no float
    boundary risk.

    Output: (stride, bucket_lo, n_pairs) — bucket_lo is the bucket's
    inclusive lower cosine bound, round-6.

    Scale shape: |strides| self-joins on the shifted id (AQE-broadcast at
    probe scale, hash joins at corpus scale), one map-side-combined
    groupBy of (stride, bucket) — the histogram frame is ~|strides|·(2/w)
    rows.
    """
    if bucket_width <= 0 or bucket_width > 2:
        raise ValueError("bucket_width must be in (0, 2]")
    w6 = round(bucket_width * 1_000_000)
    a = df.select(F.col(id_col).alias("__ia"), F.col(vec_col).alias("__va"))
    outs = []
    for s in strides:
        b = df.select(
            (F.col(id_col) - F.lit(s)).alias("__ia"),
            F.col(vec_col).alias("__vb"),
        )
        c6 = F.round(cosine_sim(F.col("__va"), F.col("__vb")) * 1_000_000).cast(
            "long"
        )
        outs.append(
            a.join(b, "__ia")
            .select(
                F.lit(s).alias("stride"),
                F.floor(c6 / F.lit(w6)).cast("long").alias("__bk"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return (
        u.groupBy("stride", "__bk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            "stride",
            F.round(F.col("__bk") * w6 / 1_000_000, 6).alias("bucket_lo"),
            "n_pairs",
        )
    )
