"""Corpus-level statistics and selection operators for training-data curation.

Beyond the reference's flatten surface: the operations a 100 TB LLM-data
pipeline runs between ingestion and training — relevance scoring (BM25 /
TF-IDF), deterministic sampling for data mixing, and distribution profiling.
All pure Column expressions + built-in aggregations; every score is
mirrored 1:1 in DuckDB (transmog_spark.oracle) for the driver's value gate.

Scale shapes:
* ``bm25_scores``: explode once -> two partial-agg groupBys (doc×term,
  term) -> one term-keyed join; global scalars (N, avgdl) ride along as a
  broadcast single-row frame, never a driver action.
* ``hash_sample``: stateless per-row predicate on a seeded 60-bit hash —
  no shuffle, reproducible across runs/engines, stable under repartition.
* ``source_percentiles``: exact interpolated percentiles via
  ``F.percentile`` (single shuffle, map-side partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.text import ws_tokens

BM25_K1 = 1.5
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per (doc, term) BM25 relevance scores over whitespace tokens.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)   (BM25+ smoothing, always >0)
    score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    The expression shape is kept identical to oracle.bm25_sql so both
    engines evaluate the same IEEE operation sequence.
    """
    base = df.select(F.col(id_col).alias("doc_id"), ws_tokens(F.col(text_col)).alias("__t"))
    exploded = base.select("doc_id", F.size("__t").alias("dl"), F.explode("__t").alias("term"))
    tf = exploded.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("__t")).alias("avgdl")
    )
    joined = tf.join(dfreq, "term").crossJoin(F.broadcast(stats))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    score = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return joined.select(
        "doc_id", "term", "tf", F.round(score, 4).alias("bm25")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k document retrieval for a term query: per-doc relevance is the
    sum of the query terms' BM25 scores (missing terms contribute 0).

    The per-doc sum uses exact scaled-integer arithmetic
    (``sum(round(bm25·1e4))``) so the score is independent of addition
    order — floating-point summation order would otherwise flip ranks
    between engines at the round(·,4) boundary.

    Scale shape: the per-(doc, term) score frame is filtered to the query's
    terms BEFORE any aggregation (a handful of keys), the per-doc sum is
    map-side combined, and the global top-k is ``orderBy().limit(k)`` — a
    TakeOrdered (per-partition top-k + driver merge of k rows), never a
    whole-corpus single-partition ranking window; ``rank`` is then a window
    over only the k collected rows.
    """
    terms = sorted({t.lower() for t in query_terms})
    scores = bm25_scores(df, id_col, text_col, k1=k1, b=b)
    hits = scores.where(F.col("term").isin(terms))
    return _topk_from_hits(hits, k)


def _topk_from_hits(hits: DataFrame, k: int) -> DataFrame:
    """Shared top-k tail: exact scaled-integer per-doc score sum (addition-
    order independent), TakeOrdered global top-k, rank window over k rows."""
    per_doc = hits.groupBy("doc_id").agg(
        (
            F.sum(F.round(F.col("bm25") * 10000).cast("long")).cast("double") / 10000.0
        ).alias("score"),
        F.count(F.lit(1)).alias("terms_matched"),
    )
    topk = per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", F.round("score", 4).alias("score"), "terms_matched", "rank"
    )


def _term_bucket_py(term: str, term_buckets: int) -> int:
    """Driver-side twin of the index's term_bucket column: 60-bit md5
    (functions.hashing.md5_long formula) mod term_buckets — lets the query
    side compute which partitions to prune to without any Spark job."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % term_buckets


def bm25_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    term_buckets: int = 64,
    mode: str = "overwrite",
) -> str:
    """Materialize the per-(term, doc) BM25 score table as a persistent,
    term-partitioned retrieval index.

    ``bm25_topk`` recomputes tf/df/avgdl from raw text on every query; a
    production retrieval surface pays that corpus scan ONCE and answers
    queries from the index. Layout: parquet partitioned by ``term_bucket =
    md5_long(term) % term_buckets`` — partitioning by raw term would create
    one directory per vocabulary term (millions at corpus scale), while
    hash buckets keep the directory count fixed and each query prunes to at
    most |query terms| buckets. The bucket hash is the engine's 60-bit md5
    (not xxhash64) so the QUERY side can compute bucket ids driver-side in
    pure Python (``_term_bucket_py``) with zero Spark work.

    Writes ``_bm25_index_meta.json`` next to the data so readers don't need
    to re-specify ``term_buckets``/``k1``/``b``.
    """
    import json
    import os

    scores = bm25_scores(df, id_col, text_col, k1=k1, b=b)
    out = scores.withColumn(
        "term_bucket", (md5_long(F.col("term")) % term_buckets).cast("int")
    )
    out.write.partitionBy("term_bucket").mode(mode).parquet(path)
    meta = {"term_buckets": term_buckets, "k1": k1, "b": b}
    with open(os.path.join(path, "_bm25_index_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return path


def bm25_topk_indexed(
    spark,
    index_path: str,
    query_terms: list[str],
    *,
    k: int = 10,
) -> DataFrame:
    """Top-k retrieval served FROM the materialized index: scans only the
    query terms' partitions (partition pruning on ``term_bucket`` + pushed
    ``term IN (...)`` filter at the parquet scan — plan-pinned), so query
    latency is decoupled from corpus-stats recompute entirely.

    Identical output contract (and oracle) as ``bm25_topk`` over the same
    corpus — the index stores the exact ``bm25_scores`` values.
    """
    import json
    import os

    with open(os.path.join(index_path, "_bm25_index_meta.json")) as fh:
        meta = json.load(fh)
    terms = sorted({t.lower() for t in query_terms})
    buckets = sorted({_term_bucket_py(t, meta["term_buckets"]) for t in terms})
    idx = spark.read.parquet(index_path)
    hits = idx.where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    return _topk_from_hits(hits, k)


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    fraction: float,
    seed: str = "smpl",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic hash sampling: keep rows whose seeded 60-bit md5 of the
    id lands under ``fraction`` of the bucket space.

    Unlike ``DataFrame.sample`` this is reproducible across runs, engines,
    partitionings, and cluster sizes — the property a training-data mix
    needs (re-running the pipeline must select the same documents).
    """
    threshold = int(fraction * buckets)
    h = md5_long(F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string")))
    return df.where((h % buckets) < threshold)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    *,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "smpl",
    buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling (data mixing): each stratum keeps
    its own fraction, unlisted strata keep ``default_fraction``."""
    thr: F.Column = F.lit(int(default_fraction * buckets))
    for k, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == k, F.lit(int(frac * buckets))).otherwise(thr)
    h = md5_long(F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string")))
    return df.where((h % buckets) < thr)


def source_percentiles(
    df: DataFrame,
    strata_col: str = "source",
    value_col: str = "n_chars",
    *,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact interpolated percentiles per stratum (distribution profiling
    for corpus QA — spotting length collapse / outlier strata)."""
    aggs = [
        F.round(F.percentile(value_col, p), 4).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    return df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"), *aggs
    )


def ngram_hashes(text: Column, n: int = 5) -> Column:
    """Distinct 60-bit hashes of word n-grams (decontamination unit)."""
    from transmog_spark.operators.dedup import word_shingles

    return F.transform(word_shingles(text, n), md5_long)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: word-n-gram overlap of each corpus doc
    against a held-out benchmark set.

    The canonical pre-training hygiene pass (GPT-3 §C / Gopher §A.5.2):
    any document sharing n-grams with an eval benchmark is flagged so the
    trainer can drop or downweight it. Scale shape: the benchmark side is
    tiny by construction (eval suites, not corpora) — its distinct n-gram
    hashes are broadcast; the corpus side is one explode + one map-side-
    combinable groupBy. No corpus shuffle keyed on anything wider than
    ``id_col``; 100 TB corpus cost = one pass + one agg.

    Output per corpus doc: ``n_ngrams`` (distinct n-grams), ``n_hit``
    (n-grams also present in the benchmark), ``contamination`` (hit
    fraction, rounded — stable across engines).
    """
    bench_grams = (
        benchmark.select(F.explode(ngram_hashes(F.col(text_col), n)).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(ngram_hashes(F.col(text_col), n)).alias("g")
    )
    joined = corpus_grams.join(F.broadcast(bench_grams), "g", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1)), 4
        ).alias("contamination"),
    )


def epoch_mixture(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    *,
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: str = "mix",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Epoch-weighted training mixture: replicate/subsample each stratum by
    a fractional weight.

    Weight ``w`` means every document appears ``floor(w)`` times, and a
    deterministic ``frac(w)`` share of documents (chosen by seeded hash,
    stable across runs/engines/partitionings) appears once more — the
    standard fractional-epoch semantics of pre-training data mixes
    (w=2.5: every doc twice, half the docs a third time; w=0.3: 30% of
    docs once). Adds ``epoch`` (0-based copy index).

    Scale shape: stateless per-row expression + explode — no shuffle, no
    driver state; replication multiplies rows exactly where the mix says,
    never materializing an intermediate copy of the corpus.
    """
    base: F.Column = F.lit(int(default_weight))
    thr: F.Column = F.lit(int(round((default_weight - int(default_weight)) * buckets)))
    for k, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {k!r}")
        is_k = F.col(strata_col) == k
        base = F.when(is_k, F.lit(int(w))).otherwise(base)
        thr = F.when(is_k, F.lit(int(round((w - int(w)) * buckets)))).otherwise(thr)
    h = md5_long(F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string"))) % buckets
    n_copies = (base + F.when(h < thr, 1).otherwise(0)).cast("int")
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(copies))


def vocab_stats(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level vocabulary statistics per stratum: token volume,
    distinct vocabulary size, type-token ratio, and the share of the single
    most frequent token — the corpus-QA counterparts of the per-document
    repetition profile (a collapsing TTR or a spiking top-token share flags
    template spam or a broken extractor upstream).

    Scale shape: one explode -> groupBy (stratum, token_hash) with map-side
    combine -> one per-stratum pivot; 8-byte hashes on the wire, never
    token strings. Same 60-bit md5 as the DuckDB oracle.
    """
    from transmog_spark.operators.text import ws_tokens

    toks = df.select(
        F.col(strata_col),
        F.explode(ws_tokens(F.col(text_col))).alias("t"),
    ).select(strata_col, md5_long(F.col("t")).alias("th"))
    cnt = toks.groupBy(strata_col, "th").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c")
    return cnt.groupBy(strata_col).agg(
        total.cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.round(F.count(F.lit(1)) / total, 4).alias("type_token_ratio"),
        F.round(F.max("c") / total, 4).alias("top_token_share"),
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    n_shards: int = 4,
    seed: str = "",
    ntok_col: str | None = None,
) -> DataFrame:
    """Deterministic global training order + shard assignment.

    Every training run needs the corpus in a reproducible pseudo-random
    order, split into shards a data loader can consume independently. The
    permutation key is md5(seed # id) — changing ``seed`` reshuffles,
    same seed replays bit-identically on any cluster size or engine (no
    RNG state, no partition-order dependence). shard = key mod
    ``n_shards``; shard_pos = 0-based rank of the key inside the shard.
    With ``ntok_col``, also passes the count through as ``n_tok`` and
    emits ``tok_offset`` — the exclusive running token total before each
    row in its shard — so a loader can seek into packed shard files
    without scanning.

    Scale shape: one hash shuffle on shard + a per-shard sort (the
    row_number window). A global permutation cannot cost less than one
    sort of the keys; sharding bounds each sort to corpus/n_shards rows —
    ``n_shards`` is the scale knob (pick >= cluster write parallelism).
    No driver actions; 8-byte keys.
    """
    from pyspark.sql import Window

    key = md5_long(F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string")))
    out = df.withColumn("__key", key).withColumn(
        "shard", F.pmod(F.col("__key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__key").asc(), F.col(id_col).asc())
    cols = [
        F.col(id_col),
        F.col("shard"),
        (F.row_number().over(w) - 1).alias("shard_pos"),
    ]
    if ntok_col is not None:
        prev = w.rowsBetween(Window.unboundedPreceding, -1)
        cols.append(F.col(ntok_col).cast("long").alias("n_tok"))
        cols.append(
            F.coalesce(F.sum(F.col(ntok_col)).over(prev), F.lit(0))
            .cast("long")
            .alias("tok_offset")
        )
    return out.select(*cols)


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    n_shards: int = 4,
    seed: str = "",
    ntok_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest for the ``training_order`` split: row count,
    token total (when ``ntok_col`` given), and an order-sensitive md5
    digest of the shard's id sequence — enough to verify a written shard
    byte-for-byte without re-reading the corpus. One groupBy; the digest
    folds ids in shard order via the same sorted-assembly idiom as the
    packing operators (collect_list is bounded by corpus/n_shards ids —
    size ``n_shards`` so id lists fit; a writer at 100 TB would fold the
    digest streamingly instead)."""
    ordered = training_order(
        df, id_col, n_shards=n_shards, seed=seed, ntok_col=ntok_col
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("shard_pos", F.col(id_col).alias("i")))
                    ),
                    lambda s: s["i"].cast("string"),
                ),
            )
        ).alias("ids_md5"),
    ]
    if ntok_col is not None:
        aggs.insert(1, F.sum("n_tok").cast("long").alias("tok_total"))
    return ordered.groupBy("shard").agg(*aggs)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    *,
    val_fraction: float = 0.1,
    seed: str = "split",
    buckets: int = 10_000,
    max_iterations: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Near-dup-aware train/validation split: hash the duplicate-CLUSTER
    representative, not the document, so near-duplicates always land in
    the same split and validation never scores memorized training text
    (the contamination mode Lee et al. 2022 §6 measure — eval near-dups of
    train members inflate scores).

    ``pairs`` is a duplicate edge list (minhash_lsh_pairs / simhash_pairs
    / embedding_neardup output); unclustered documents key on their own
    id. Returns (``id_col``, split_key, split) with split ∈
    {'train', 'val'} — a verdict table, so callers filter with one
    semi-join and the assignment stays auditable. Deterministic across
    runs, engines, partitionings and cluster sizes (the ``hash_sample``
    hash on the cluster key).

    Scale shape: components are the bounded ``duplicate_components``
    machinery (only clustered docs appear in the frame — tiny vs the
    corpus), the key join is one left join (broadcast-eligible whenever
    the dup set fits), and the split decision is a stateless per-row
    expression. No shuffle beyond the component rounds.
    """
    from transmog_spark.operators.dedup import duplicate_components

    comps = duplicate_components(
        pairs, max_iterations=max_iterations, algorithm=algorithm
    ).withColumnsRenamed({"doc_id": "__cid_doc", "cluster_id": "__cluster"})
    keyed = df.select(F.col(id_col)).join(
        comps, F.col(id_col) == F.col("__cid_doc"), "left"
    )
    split_key = F.coalesce(F.col("__cluster"), F.col(id_col).cast("long"))
    h = md5_long(F.concat(F.lit(f"{seed}#"), split_key.cast("string")))
    threshold = int(val_fraction * buckets)
    return keyed.select(
        F.col(id_col),
        split_key.alias("split_key"),
        F.when(h % buckets < threshold, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
