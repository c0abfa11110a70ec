"""Persistent, incrementally updatable ANN (IVF) index.

``ivf_topk`` re-derives centroids and re-assigns the whole corpus on
every call; a production retrieval surface pays that corpus scan ONCE
and serves queries from a materialized index — the same posture as the
BM25 v2 index (operators/corpus.py:bm25_index). Layout:

* ``<path>/vectors/`` — (vec_id, vec) partitioned by ``cell`` (the
  vector's inverted-list id). Per-VECTOR facts: a vector's cell depends
  only on the vector and the FROZEN centroids, never on other rows, so a
  corpus delta only APPENDS files — the invariant that makes increments
  bit-identical to rebuilds (contrast BM25, where global df/avgdl forced
  score computation to read time; here there is no global statistic at
  all).
* ``<path>/_ann_index_meta.json`` — nlist + the frozen centroids (and
  their exact fold-order norms) + n_vecs. Centroids are trained once at
  build (deterministic md5-seeded k-means, ``_seed_centroids`` /
  ``kmeans_refine``) and NEVER move on update — FAISS's train-then-add
  contract: retraining on every delta would re-shuffle the entire corpus
  into new lists.

Query path (``ann_topk_indexed``): centroids load from the meta file as
plan-time literals (zero Spark work), probe cells collect driver-side
(bounded by nlist), the vectors scan prunes to the probed cells'
partitions, and the (queries × nprobe)-row probe frame broadcasts — the
corpus never shuffles, mirroring ``bm25_topk_indexed``'s pruned-postings
shape. Output contract (and oracle) identical to ``ivf_topk``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.operators.dedup import cosine_sim
from transmog_spark.operators.similarity import (
    _centroid_sim_structs,
    _seed_centroids,
    kmeans_refine,
)

META_NAME = "_ann_index_meta.json"


def _read_meta(index_path: str) -> dict:
    with open(os.path.join(index_path, META_NAME)) as fh:
        meta = json.load(fh)
    if meta.get("version") != 1:
        raise ValueError(f"not a v1 ann index: {index_path}")
    return meta


def _write_meta(index_path: str, meta: dict) -> None:
    meta_path = os.path.join(index_path, META_NAME)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)


def _assign_cells(
    df: DataFrame, id_col: str, vec_col: str, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, vec, cell) — argmax-cosine assignment over centroid
    literals: a pure per-row expression, ZERO shuffle (same plan shape as
    ``ivf_topk``'s assignment; round(·,6) + lowest-cid tie-break keys so
    build, update and the DuckDB oracle all agree)."""
    sim_structs = _centroid_sim_structs(cents)
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.array_max(sim_structs(F.col(vec_col)))["cid"].cast("int").alias("cell"),
    )


def ann_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    nlist: int = 16,
    refine_iterations: int = 0,
    dim: int | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> str:
    """Materialize the index; returns ``path``.

    Pass ``centroids`` to build against an EXISTING frozen centroid set
    (the increments-≡-rebuild verification hook); otherwise centroids are
    trained here exactly as ``ivf_topk`` trains them (md5-smallest seed
    rows, optional Lloyd refinement) so a one-shot index over a corpus
    answers queries identically to ``ivf_topk`` over that corpus.
    """
    if centroids is None:
        c = corpus.select(
            F.col(id_col).alias("__sid"), F.col(vec_col).alias("__cv")
        )
        centroids = _seed_centroids(c, "__sid", nlist)
        if refine_iterations > 0:
            if dim is None:
                raise ValueError("refine_iterations requires explicit dim")
            centroids = kmeans_refine(
                c.select("__cv"), centroids, dim=dim, iterations=refine_iterations
            )
    assigned = _assign_cells(corpus, id_col, vec_col, centroids)
    assigned.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(path, "vectors")
    )
    n_vecs = corpus.count()
    _write_meta(
        path,
        {
            "version": 1,
            "nlist": len(centroids),
            "centroids": [[cid, list(cv)] for cid, cv in centroids],
            "n_vecs": int(n_vecs),
        },
    )
    return path


def index_centroids(index_path: str) -> list[tuple[int, list[float]]]:
    """The frozen centroid set, as stored — loads from the meta file with
    zero Spark work."""
    meta = _read_meta(index_path)
    return [(int(cid), [float(x) for x in cv]) for cid, cv in meta["centroids"]]


def ann_index_update(
    spark,
    delta: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Fold a vector DELTA into an existing index at cost ∝ |delta|, not
    |corpus|: assign the delta against the FROZEN centroids (per-row
    expression, no shuffle) and append its files into their cells. The
    result is bit-identical to ``ann_index`` over the union corpus with
    the same centroids (pinned by tests/test_ann_index.py) because a
    vector's cell is a pure function of (vector, centroids).

    Contract: delta vec_ids must be NEW vectors (append-only corpus) —
    re-submitting an indexed id stores it twice, exactly as a duplicated
    input would in a full rebuild.
    """
    cents = index_centroids(index_path)
    assigned = _assign_cells(delta, id_col, vec_col, cents)
    assigned.write.partitionBy("cell").mode("append").parquet(
        os.path.join(index_path, "vectors")
    )
    meta = _read_meta(index_path)
    meta["n_vecs"] += int(delta.count())
    _write_meta(index_path, meta)
    return index_path


def ann_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    *,
    query_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k cosine retrieval served FROM the materialized index.

    Centroids come from the meta file as plan-time literals; each query
    probes its ``nprobe`` best cells (same sort keys as ``ivf_topk``);
    the union of probed cell ids — at most ``nlist`` ints, the same
    bounded-collect class as ``bm25_index_update``'s touched-bucket list —
    prunes the vectors scan to those partitions (plan-pinned); the probe
    frame broadcasts so the corpus slice never shuffles. Scores reflect
    every increment folded in so far. Output contract (and oracle)
    identical to ``ivf_topk`` over the same corpus: (query_id,
    neighbor_id, cosine, rank).
    """
    cents = index_centroids(index_path)
    sim_structs = _centroid_sim_structs(cents)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    top_cids = F.transform(
        F.slice(F.sort_array(sim_structs(F.col("__qv")), asc=False), 1, nprobe),
        lambda st: st["cid"],
    )
    probes = q.select(
        "query_id", "__qv", F.explode(top_cids).alias("cell")
    ).withColumn("cell", F.col("cell").cast("int"))
    cells = sorted(
        r["cell"] for r in probes.select("cell").distinct().collect()
    )
    vectors = (
        spark.read.parquet(os.path.join(index_path, "vectors"))
        .where(F.col("cell").isin(cells))
    )
    joined = vectors.join(F.broadcast(probes), "cell")
    if exclude_self:
        joined = joined.where(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_sim(F.col("__qv"), F.col("vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
        )
    )
