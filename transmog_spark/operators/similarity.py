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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
) -> DataFrame:
    """IVF-style ANN: partition the corpus into ``nlist`` inverted lists
    around deterministic centroids; probe the ``nprobe`` nearest lists.

    Centroids are the vectors of the ``nlist`` corpus rows with the smallest
    md5 hash of their id — no RNG, no iteration, bit-reproducible in the
    DuckDB oracle (a k-means refinement would drop in here on a real
    cluster; list assignment and probing stay identical).

    Scale shape: centroid set is tiny (broadcast); corpus assignment is one
    narrow pass + rank; the query-side join touches ``nprobe/nlist`` of the
    corpus instead of all of it. Similarities are ranked on round(cos, 6)
    with id tie-breaks so both engines order identically.
    """
    from transmog_spark.functions.hashing import md5_long

    qid = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    cent = (
        c.orderBy(md5_long(F.col("neighbor_id").cast("string")).asc(), F.col("neighbor_id").asc())
        .limit(nlist)
        .select(F.col("neighbor_id").alias("__cid"), F.col("__cv").alias("__centv"))
    )

    sim_to_cent = F.round(cosine_sim(F.col("__cv"), F.col("__centv")), 6)
    wa = Window.partitionBy("neighbor_id").orderBy(sim_to_cent.desc(), F.col("__cid").asc())
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .withColumn("__rn", F.row_number().over(wa))
        .where(F.col("__rn") == 1)
        .select("neighbor_id", "__cv", "__cid")
    )

    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    sim_q_cent = F.round(cosine_sim(F.col("__qv"), F.col("__centv")), 6)
    wq = Window.partitionBy("query_id").orderBy(sim_q_cent.desc(), F.col("__cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "__cid")
    )

    joined = assigned.join(probes, "__cid")
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
    exclude_self: bool = True,
) -> DataFrame:
    """ANN top-k via hyperplane LSH buckets with multi-probe.

    Probe 0 is the query's own bucket; probes 1..n flip one signature bit
    (nearest Hamming neighbors), boosting recall without touching the
    corpus side's single signature pass.
    """
    qid = query_id_col or id_col
    dim = len(corpus.select(vec_col).first()[0])

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

    joined = c.join(q, "__bkey")
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "neighbor_id", cosine_sim(F.col("__qv"), F.col("__cv")).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
