"""N-gram language-model quality scoring (perplexity filtering).

The CCNet / Gopher-style corpus-quality gate: train a bigram LM on a
deterministic hash-split of the corpus, score every document by its
average bigram log-probability, and filter/stratify on the score. Low
avg-logp (high perplexity) flags boilerplate, non-language noise, and
OCR garbage; suspiciously high avg-logp flags templated duplication.

Scale shape (100 TB posture):

* counts are two partial-agg ``groupBy`` passes over exploded bigrams —
  map-side combine keeps the shuffle at distinct-gram volume;
* scoring pre-aggregates to (doc, distinct bigram, multiplicity) before
  joining the count tables, so the join stream is bounded by distinct
  grams per doc, not token count;
* the two count joins are plain shuffle joins on the gram key — hot grams
  ("of the") are exactly the AQE skew-join case, same posture as BM25's
  term join (BENCH/skew_bm25.md);
* the 3 scalar model stats (vocab size, context total, trained flag)
  travel as a broadcast single-row frame, like BM25's avgdl.

Cross-engine determinism: per-bigram log-probabilities are rounded to 4
decimals and summed as scaled integers (``sum(round(logp*10000) as
long)``) so the doc aggregate is addition-order independent and the
DuckDB oracle (``oracle.lm_perplexity_sql``) hashes identically; ln() is
evaluated on bit-identical doubles on both engines (counts are exact
longs), so the 1e-4 rounding grid absorbs any last-ulp libm divergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.text import ws_tokens

LM_K = 0.5  # add-k smoothing constant


def bigram_array(toks: Column) -> Column:
    """Adjacent word pairs WITH multiplicity, in order: zip the token array
    against its 1-shifted slice (O(tokens), same idiom as word_shingles —
    never per-position slice). Docs with < 2 tokens yield an empty array."""
    size = F.size(toks)
    shifted = F.slice(toks, 2, F.greatest(size - 1, F.lit(0)))
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(size - 1, F.lit(0))),
        shifted,
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.filter(grams, lambda x: x.isNotNull())


def _train_split(df: DataFrame, id_col: str, train_pct: int) -> DataFrame:
    """Deterministic stateless split: md5 of the id, no shuffle, no RNG —
    the same seeded-hash predicate as corpus.hash_sample."""
    return df.where(
        md5_long(F.col(id_col).cast("string")) % 100 < F.lit(train_pct)
    )


def ngram_lm_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    train_pct: int = 80,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram model: returns (bigram_counts, context_counts,
    stats) where stats is a single-row frame (vocab_size, n_contexts).

    ``context_counts`` are derived FROM the bigram counts (count of w1 as a
    bigram context), so conditional probabilities normalize exactly.

    Plan note: the explicit isNotNull filters on the gram and its w1 prefix
    are semantic no-ops (explode of a null-filtered array) but load-bearing
    for cost — downstream joins push isnotnull(gram) into the bigram-count
    branch and isnotnull(substring_index(gram)) into the context-count
    branch, and without matching base filters the two subtrees stop being
    canonically equal, so ReuseExchange re-scans the corpus for the context
    counts instead of reusing the bigram shuffle (the vocab_kl lesson;
    pinned in tests/test_plan_quality.py).
    """
    toks = _train_split(df, id_col, train_pct).select(
        ws_tokens(F.col(text_col)).alias("__toks")
    )
    grams = toks.select(F.explode(bigram_array(F.col("__toks"))).alias("gram")).where(
        F.col("gram").isNotNull()
        & F.substring_index("gram", " ", 1).isNotNull()
    )
    bigram_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c2"))
    context_counts = bigram_counts.groupBy(
        F.substring_index("gram", " ", 1).alias("w1")
    ).agg(F.sum("c2").alias("c1"))
    vocab = (
        toks.select(F.explode("__toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    return bigram_counts, context_counts, vocab


def _doc_grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram, multiplicity) — pre-aggregated to distinct grams per doc so
    downstream count-table joins see one row per (doc, gram), not one per
    token position."""
    return (
        df.select(
            F.col(id_col),
            # outer + isNotNull: bigram elements are never NULL; avoids the
            # inferred generate filter re-evaluating the bigram expression
            # at the scan (dedup.minhash_signatures note)
            F.explode_outer(bigram_array(ws_tokens(F.col(text_col)))).alias("gram"),
        )
        .where(F.col("gram").isNotNull())
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("m"))
    )


def _avg_e4(slp_col: str, n_col: str) -> Column:
    """Exact integer round-half-away-from-zero of slp/n at the 1e-4 grid:
    slp/n lands on a half-grid tie with probability ~1/(2n) per doc, and
    Spark/DuckDB disagree on double tie-rounding — so divide in BIGINTs
    ((|slp|*2 + n) DIV 2n). Both engines then derive bit-identical doubles
    from the same integer with no round() call at all."""
    return F.when(F.col(slp_col) < 0, F.lit(-1)).otherwise(F.lit(1)) * F.expr(
        f"(abs({slp_col}) * 2 + {n_col}) DIV (2 * {n_col})"
    )


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    train_pct: int = 80,
    k: float = LM_K,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document bigram-LM quality score against a model trained on the
    ``train_pct`` hash-split of the same frame — or against a pre-trained
    ``model`` (the ``ngram_lm_counts`` triple). Passing ``model`` is the
    train-once/score-many production shape, and what the streaming gate
    uses (the count frames join stream-static per micro-batch).

    Output: (id, n_bigrams, n_oov, avg_logp, ppl) — avg_logp is the mean
    add-k-smoothed ln P(w2|w1), n_oov counts bigrams never seen in
    training. Docs with < 2 tokens have no bigrams and are absent.

    Minimum-corpus requirement: the train split must contain at least one
    bigram (vocab_size >= 1). A degenerate/empty split is clamped to
    vocab_size = 1 so scoring degrades to the uniform add-k model instead
    of ln(x/0) = ±Inf overflowing the scaled-integer sum silently.
    """
    bigram_counts, context_counts, vocab = model or ngram_lm_counts(
        df, id_col, text_col, train_pct=train_pct
    )

    doc_grams = _doc_grams(df, id_col, text_col)
    scored = (
        doc_grams.join(bigram_counts, "gram", "left")
        .withColumn("w1", F.substring_index("gram", " ", 1))
        .join(context_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            "m",
            F.coalesce("c2", F.lit(0)).alias("c2"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
            "vocab_size",
        )
    )
    logp = F.log(
        (F.col("c2") + F.lit(k))
        / (F.col("c1") + F.lit(k) * F.greatest(F.col("vocab_size"), F.lit(1)))
    )
    # scaled-integer sum of per-gram round(logp,4): order-independent and
    # bit-identical in the DuckDB mirror
    per_doc = scored.groupBy(id_col).agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("c2") == 0, F.col("m")).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.sum(F.round(logp * 10000).cast("long") * F.col("m")).alias("__slp"),
    )
    per_doc = per_doc.withColumn("__avg_e4", _avg_e4("__slp", "n_bigrams"))
    avg = F.col("__avg_e4") / F.lit(10000.0)
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        "n_oov",
        avg.alias("avg_logp"),
        F.round(F.exp(-avg), 2).alias("ppl"),
    )


KN_D = 0.75  # absolute discount (Kneser-Ney classic)


def kn_lm_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    train_pct: int = 80,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Train the interpolated Kneser-Ney bigram model: returns
    (bigram_counts, ctx_stats, cont_counts, stats).

    * ``bigram_counts``  — (gram, c2)
    * ``ctx_stats``      — (w1, c1, n1fwd): context total and the number of
      DISTINCT continuations of w1 (the interpolation weight's numerator)
    * ``cont_counts``    — (w2, n1bwd): in how many distinct contexts w2
      completes a bigram — KN's signature statistic ("how novel is w2 as a
      continuation", the reason 'Francisco' scores low despite raw
      frequency)
    * ``stats``          — single row (vocab_size, n_types): unigram vocab
      + distinct bigram types (the continuation-distribution denominator)

    Scale shape: everything below the bigram count is a groupBy OF
    ``bigram_counts`` (distinct-gram volume, partial-agg combined); the
    corpus is scanned twice (grams + vocab), same as ``ngram_lm_counts``.
    """
    toks = _train_split(df, id_col, train_pct).select(
        ws_tokens(F.col(text_col)).alias("__toks")
    )
    grams = toks.select(F.explode(bigram_array(F.col("__toks"))).alias("gram")).where(
        F.col("gram").isNotNull()
        & F.substring_index("gram", " ", 1).isNotNull()
    )
    bigram_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c2"))
    ctx_stats = bigram_counts.groupBy(
        F.substring_index("gram", " ", 1).alias("w1")
    ).agg(
        F.sum("c2").alias("c1"),
        F.count(F.lit(1)).alias("n1fwd"),
    )
    cont_counts = bigram_counts.groupBy(
        F.substring_index("gram", " ", -1).alias("w2")
    ).agg(F.count(F.lit(1)).alias("n1bwd"))
    vocab = (
        toks.select(F.explode("__toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    types = bigram_counts.agg(F.count(F.lit(1)).alias("n_types"))
    stats = vocab.crossJoin(types)
    return bigram_counts, ctx_stats, cont_counts, stats


def kn_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    train_pct: int = 80,
    discount: float = KN_D,
    k: float = LM_K,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram score — the smoothing
    family CCNet's actual KenLM filter uses (Kneser & Ney 1995; Chen &
    Goodman 1999 §2.7), upgrading ``lm_score``'s add-k baseline:

        P(w2|w1) = max(c2 - D, 0)/c1 + (D·n1fwd(w1)/c1) · Pcont(w2)
        Pcont(w2) = (n1bwd(w2) + k) / (n_types + k·|V|)

    with full backoff to ``Pcont`` when the context is unseen (c1 = 0).
    The add-k floor on the continuation distribution keeps every
    probability strictly positive (finite log) without a separate OOV
    class — the same clamp discipline as ``lm_score``.

    Output: (id, n_bigrams, n_oov, avg_logp, ppl) — identical schema to
    ``lm_score`` so the two scores are drop-in comparable; n_oov counts
    bigrams unseen in training. Docs with < 2 tokens are absent.

    Scale shape: one doc-gram pass, THREE count joins (gram, w1, w2 — each
    the AQE-skew posture of BM25's term join), one broadcast scalar frame.
    Scaled-integer logp sums on the 1e-4 grid, same cross-engine
    determinism argument as ``lm_score``; the DuckDB mirror
    (``oracle.kn_perplexity_sql``) writes the probability expression with
    the identical operation order so ln() sees bit-identical doubles.
    """
    bc, ctx, cont, stats = model or kn_lm_counts(
        df, id_col, text_col, train_pct=train_pct
    )

    doc_grams = _doc_grams(df, id_col, text_col)
    scored = (
        doc_grams.join(bc, "gram", "left")
        .withColumn("w1", F.substring_index("gram", " ", 1))
        .withColumn("w2", F.substring_index("gram", " ", -1))
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            "m",
            F.coalesce("c2", F.lit(0)).alias("c2"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("n1fwd", F.lit(0)).alias("n1fwd"),
            F.coalesce("n1bwd", F.lit(0)).alias("n1bwd"),
            "vocab_size",
            "n_types",
        )
    )
    # operation order mirrored verbatim in the SQL oracle
    pcont = (F.col("n1bwd") + F.lit(k)) / (
        F.col("n_types") + F.lit(k) * F.greatest(F.col("vocab_size"), F.lit(1))
    )
    seen = F.greatest(F.col("c2") - F.lit(discount), F.lit(0.0)) / F.col("c1") + (
        F.lit(discount) * F.col("n1fwd") / F.col("c1")
    ) * pcont
    logp = F.log(F.when(F.col("c1") > 0, seen).otherwise(pcont))
    per_doc = scored.groupBy(id_col).agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("c2") == 0, F.col("m")).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.sum(F.round(logp * 10000).cast("long") * F.col("m")).alias("__slp"),
    )
    per_doc = per_doc.withColumn("__avg_e4", _avg_e4("__slp", "n_bigrams"))
    avg = F.col("__avg_e4") / F.lit(10000.0)
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        "n_oov",
        avg.alias("avg_logp"),
        F.round(F.exp(-avg), 2).alias("ppl"),
    )


def importance_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    target: Column,
    k: float = LM_K,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    under a bigram LM trained on the ``target`` subset and one trained on
    the whole (raw) corpus; the log importance ratio
    ``avg_logp_target - avg_logp_raw`` ranks documents by how much more
    target-like than corpus-typical they are. Resampling with probability
    proportional to ``exp(log_ratio)`` is then a stateless seeded-hash
    predicate (``corpus.hash_sample``) over the output.

    Scale shape: one doc-gram pass (distinct grams per doc), four count
    joins on the gram/context key (AQE-skew posture, same as BM25's term
    join), two broadcast single-row vocab frames. All logp sums are
    scaled-integer exact, so the DuckDB mirror (``oracle.importance_sql``)
    hashes identically.

    Output: (id, n_bigrams, avg_logp_target, avg_logp_raw, log_ratio).
    Docs with < 2 tokens have no bigrams and are absent.
    """
    bc_t, cc_t, v_t = ngram_lm_counts(
        df.where(target), id_col, text_col, train_pct=100
    )
    bc_r, cc_r, v_r = ngram_lm_counts(df, id_col, text_col, train_pct=100)

    scored = (
        _doc_grams(df, id_col, text_col)
        .join(bc_t.withColumnRenamed("c2", "c2_t"), "gram", "left")
        .join(bc_r.withColumnRenamed("c2", "c2_r"), "gram", "left")
        .withColumn("w1", F.substring_index("gram", " ", 1))
        .join(cc_t.withColumnRenamed("c1", "c1_t"), "w1", "left")
        .join(cc_r.withColumnRenamed("c1", "c1_r"), "w1", "left")
        .crossJoin(F.broadcast(v_t.withColumnRenamed("vocab_size", "v_t")))
        .crossJoin(F.broadcast(v_r.withColumnRenamed("vocab_size", "v_r")))
    )

    def _slp(c2: str, c1: str, v: str) -> Column:
        # greatest(v, 1): same degenerate-model clamp as lm_score — a
        # target predicate matching zero docs (or only 1-token docs) gives
        # vocab_size 0, and ln(x/0) = +Inf would overflow the
        # scaled-integer sum silently instead of failing loudly
        logp = F.log(
            (F.coalesce(c2, F.lit(0)) + F.lit(k))
            / (F.coalesce(c1, F.lit(0)) + F.lit(k) * F.greatest(F.col(v), F.lit(1)))
        )
        return F.sum(F.round(logp * 10000).cast("long") * F.col("m"))

    per_doc = scored.groupBy(id_col).agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        _slp("c2_t", "c1_t", "v_t").alias("__slp_t"),
        _slp("c2_r", "c1_r", "v_r").alias("__slp_r"),
    )
    per_doc = per_doc.withColumn(
        "__t_e4", _avg_e4("__slp_t", "n_bigrams")
    ).withColumn("__r_e4", _avg_e4("__slp_r", "n_bigrams"))
    return per_doc.select(
        F.col(id_col),
        "n_bigrams",
        (F.col("__t_e4") / F.lit(10000.0)).alias("avg_logp_target"),
        (F.col("__r_e4") / F.lit(10000.0)).alias("avg_logp_raw"),
        ((F.col("__t_e4") - F.col("__r_e4")) / F.lit(10000.0)).alias("log_ratio"),
    )


def importance_resample(
    weights: DataFrame,
    id_col: str = "doc_id",
    *,
    n: int,
    seed: int | str = 0,
    temperature: float = 1.0,
    ratio_col: str = "log_ratio",
) -> DataFrame:
    """The RESAMPLING half of DSIR (Xie et al. 2023 §3): draw ``n``
    documents without replacement with probability ∝ exp(log_ratio / T),
    deterministically — the Efraimidis–Spirakis (2006) weighted
    reservoir: each doc gets ``log_key = ln(u) * exp(-log_ratio / T)``
    with ``u = md5(seed#id) / 2^60`` ∈ (0,1), and the top-n by key ARE a
    weighted sample without replacement. No RNG state, no partition-order
    dependence: same seed replays the identical sample on any cluster
    size or engine.

    ``weights`` is ``importance_weights`` output (or any (id, log_ratio)
    frame). Keys are rounded to 1e-6 BEFORE ranking with an id tie-break,
    so the DuckDB mirror (``oracle.importance_resample_sql``) ranks
    identically despite libm-vs-StrictMath ulp drift in ln/exp.

    Output: (id, log_ratio, w, key, rank), rank 1..n by key descending.

    Scale shape: one stateless expression pass + a global top-n
    (TakeOrdered — no full sort materialization); the weights frame is
    doc-count-sized, tiny next to the corpus it summarizes.
    """
    u = md5_long(F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string")))
    u_frac = (u.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))  # (0,1]
    log_key = F.log(u_frac) * F.exp(-F.col(ratio_col) / F.lit(temperature))
    scored = weights.select(
        F.col(id_col),
        F.col(ratio_col),
        F.round(F.exp(F.col(ratio_col) / F.lit(temperature)), 4).alias("w"),
        F.round(log_key, 6).alias("key"),
    )
    # orderBy + limit plans as TakeOrderedAndProject (per-partition top-n
    # + driver merge, no global sort shuffle); the rank window then runs
    # over <= n rows only
    top = scored.orderBy(F.col("key").desc(), F.col(id_col).asc()).limit(n)
    win = Window.orderBy(F.col("key").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(win)).select(
        id_col, ratio_col, "w", "key", "rank"
    )


def domain_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    *,
    target: Column,
    temperature: float = 1.0,
    k: float = LM_K,
) -> DataFrame:
    """DoReMi-style domain reweighting, reduced to the DSIR signal (Xie et
    al. 2023 DoReMi trains a proxy model; this lite form uses the bigram
    importance ratio already computed by ``importance_weights``): a
    domain whose documents score more target-like than corpus-typical gets
    upweighted, weight ∝ exp(mean_log_ratio / temperature), normalized
    over domains.

    Determinism: per-domain means aggregate the per-doc scaled-integer e4
    ratios (order-free integer sums + the _avg_e4 integer division);
    exp() is rounded to the 1e-4 grid before normalizing, and the
    normalizer is an integer sum of those grid values — so the output
    weights are bit-identical in the DuckDB mirror
    (``oracle.domain_weights_sql``) no matter the partitioning.

    Scale shape: everything up to the per-domain groupBy is
    ``importance_weights`` (gram-key joins, AQE-skew posture); the domain
    aggregate is a handful of rows; the normalizer is a broadcast
    single-row frame.

    Output: (source, n_docs, mean_log_ratio, weight) — weight sums to ~1.
    """
    iw = importance_weights(df, id_col, text_col, target=target, k=k)
    j = df.select(F.col(id_col), F.col(source_col)).join(iw, id_col)
    per = j.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.round(F.col("log_ratio") * 10000).cast("long")).alias("__slr"),
    )
    per = per.withColumn("__mean_e4", _avg_e4("__slr", "n_docs"))
    # exp on the exact e4 grid value, snapped back to an integer grid so
    # the cross-domain normalizer is an order-free integer sum
    w_int = F.round(
        F.exp(F.col("__mean_e4") / F.lit(10000.0) / F.lit(temperature)) * 10000
    ).cast("long")
    per = per.withColumn("__w", w_int)
    total = per.agg(F.sum("__w").alias("__tot"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            (F.col("__mean_e4") / F.lit(10000.0)).alias("mean_log_ratio"),
            F.round(F.col("__w") / F.col("__tot"), 4).alias("weight"),
        )
    )


def vocab_kl(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source unigram-distribution drift: KL(P_source || P_corpus).

    The data-mixing telemetry number: how far each source's token
    distribution sits from the blended corpus (0 = indistinguishable;
    large = the source pulls the mixture). The standard monitor for
    domain shift between snapshots, for spotting a source whose scrape
    quality changed, and for sanity-checking DoReMi/DSIR-style reweighting
    (a weight change should move the blend toward the target, i.e. shrink
    the target's KL). KL(P_s || P) = sum_t p_st * ln(p_st / p_t) over the
    source's own support, so it is finite by construction (p_st > 0 and
    p_t >= p_st / T > 0 wherever it is evaluated).

    Scale shape (100 TB posture): one token explode -> map-side-combined
    (source, token-hash) counts; corpus-wide token counts re-aggregate
    THOSE (distinct-token volume, never a second corpus pass); the join
    back is on the token hash — hot tokens are the AQE skew-join case,
    same posture as the BM25 term join. Per-source totals and the grand
    total are broadcast. Only 8-byte hashes cross the wire; output is
    one row per source.

    Cross-engine determinism: each ln(ratio) lands on the 1e-4 grid and
    the per-source sum is an exact long weighted by exact counts
    (addition-order independent), the same idiom as ``lm_score`` — the
    DuckDB mirror (``oracle.vocab_kl_sql``) hashes identically.

    Output: (source, n_tokens, n_types, kl). Null-source rows are excluded
    up front (mirrored in the oracle).

    Plan note: the explicit isNotNull filters on BOTH key columns are
    load-bearing — they make all four consumers of the (source, token)
    count frame canonically identical, so Spark's ReuseExchange collapses
    the plan to ONE corpus scan + one shuffled count reused three times.
    Without them, the joins push isnotnull() constraints into only the
    joined branches and the corpus is scanned four times (pinned in
    tests/test_plan_quality.py).
    """
    toks = (
        df.where(F.col(source_col).isNotNull())
        .select(F.col(source_col), F.explode(ws_tokens(F.col(text_col))).alias("__t"))
        .select(source_col, md5_long(F.col("__t")).alias("__gh"))
        .where(F.col("__gh").isNotNull())
    )

    st = toks.groupBy(source_col, "__gh").agg(F.count(F.lit(1)).alias("__c"))
    glob = st.groupBy("__gh").agg(F.sum("__c").alias("__ct"))
    per_src = st.groupBy(source_col).agg(
        F.sum("__c").alias("__ts"), F.count(F.lit(1)).alias("__types")
    )
    total = st.agg(F.sum("__c").alias("__t"))

    joined = (
        st.join(glob, "__gh")
        .join(F.broadcast(per_src), source_col)
        .crossJoin(F.broadcast(total))
    )
    # ln((c_st * T) / (C_t * T_s)) with explicit double casts BEFORE the
    # multiplies: identical IEEE op order on both engines, no bigint
    # overflow at any corpus size
    lr = F.log(
        (F.col("__c").cast("double") * F.col("__t").cast("double"))
        / (F.col("__ct").cast("double") * F.col("__ts").cast("double"))
    )
    contrib = F.round(lr * 10000).cast("long") * F.col("__c")
    agg = joined.groupBy(source_col).agg(
        F.max("__ts").alias("__ts"),
        F.max("__types").alias("__types"),
        F.sum(contrib).alias("__skl"),
    )
    return agg.select(
        F.col(source_col),
        F.col("__ts").cast("long").alias("n_tokens"),
        F.col("__types").cast("long").alias("n_types"),
        F.round(
            F.col("__skl").cast("double") / F.col("__ts") / F.lit(10000.0), 4
        ).alias("kl"),
    )


def ppl_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    group_col: str = "source",
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    train_pct: int = 80,
    k: float = LM_K,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    cutoffs: str = "exact",
) -> DataFrame:
    """CCNet's head/middle/tail perplexity split (Wenzek et al. 2020 §4.3):
    within each ``group_col`` stratum (language / dump / source), rank
    documents by bigram-LM quality and cut the stratum into
    ``len(labels)`` equal-count buckets — ``labels[0]`` ("head") is the
    lowest-perplexity (highest-quality) slice. This is the selection knob
    the CCNet/LLaMA data recipes expose: train on head+middle, drop tail,
    or α-sample across buckets.

    Ranking key: ``avg_logp`` DESC (ppl = exp(-avg_logp), so descending
    avg_logp is ascending perplexity), tie-broken by ``id_col`` —
    avg_logp is the exact 1e-4-grid integer ``lm_score`` derives in BIGINT
    arithmetic on both engines, so the order (and hence every bucket
    boundary) is engine-identical; no floating-point rank flip can move a
    doc across a cut. Docs with < 2 tokens have no bigrams and are absent
    (same contract as ``lm_score``).

    ``cutoffs='exact'`` (default, the oracle-parity path) assigns buckets
    with ``ntile`` over a per-group sort — one exchange on ``group_col``
    plus an in-partition sort, the same shape CCNet's own per-language
    shard sort has. At 100 TB strata a full per-group sort is the
    expensive-but-honest option; ``cutoffs='approx'`` instead aggregates
    per-group ``percentile_approx`` cut values of avg_logp (a tiny
    |groups|·(n-1) frame, broadcast back) and labels by stateless
    comparison — no sort, one extra map-side-combined agg, at the cost of
    count-exactness when ties straddle a cut (ties share a bucket instead
    of splitting ntile-style). Value-threshold corollary: on a tiny
    stratum the lowest cut can equal the stratum minimum and leave the
    last bucket empty; assignment stays monotone in perplexity either
    way, and at production stratum sizes the two paths differ by at most
    the docs sitting exactly on a cut value.

    Output: (id, group, ppl, bucket).
    """
    if len(labels) < 2:
        raise ValueError("ppl_buckets needs at least 2 labels")
    if cutoffs not in ("exact", "approx"):
        raise ValueError(f"cutoffs must be 'exact' or 'approx', got {cutoffs!r}")
    scored = lm_score(
        df, id_col, text_col, train_pct=train_pct, k=k, model=model
    )
    j = scored.join(df.select(id_col, group_col), id_col)
    n = len(labels)
    label_arr = F.array(*[F.lit(lab) for lab in labels])
    if cutoffs == "exact":
        w = Window.partitionBy(group_col).orderBy(
            F.col("avg_logp").desc(), F.col(id_col).asc()
        )
        bucket = F.element_at(label_arr, F.ntile(n).over(w))
    else:
        fracs = [1.0 - i / n for i in range(1, n)]  # descending avg_logp cuts
        cuts = j.groupBy(group_col).agg(
            F.percentile_approx("avg_logp", fracs, 100000).alias("__cuts")
        )
        j = j.join(F.broadcast(cuts), group_col)
        # labels[0] iff avg_logp >= cuts[0] (the (n-1)/n percentile), …;
        # unrolled at plan time (labels is a python tuple)
        bucket = F.lit(labels[-1])
        for i in range(n - 2, -1, -1):
            bucket = F.when(
                F.col("avg_logp") >= F.element_at(F.col("__cuts"), i + 1),
                F.lit(labels[i]),
            ).otherwise(bucket)
    return j.select(
        F.col(id_col), F.col(group_col), F.col("ppl"), bucket.alias("bucket")
    )
