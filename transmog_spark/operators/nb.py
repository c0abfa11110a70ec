"""Multinomial Naive-Bayes document classifier (the corpus-filter model).

The classic web-curation move (CCNet, GPT-3's WebText filter, fastText
language/domain ID): train a cheap linear-in-log-space classifier on a
labeled seed and score the whole corpus with it — "is this page
wiki-like?", "which domain does this doc belong to?". Multinomial NB is
the exactly-distributable member of that family: training is one
token-count ``groupBy`` and scoring is one join plus a sum, with no
iterative optimization, so the full train-and-classify pass is a
deterministic DataFrame plan with a DuckDB mirror (no gradient-descent
nondeterminism to paper over).

Scale shape (100 TB posture):

* training counts are one exploded-token ``groupBy(label, tok)`` —
  map-side combine keeps the shuffle at distinct (label, token) volume;
  class totals and the vocab size are derived FROM that count frame
  (reusing its shuffle), and the per-class stats frame is C rows,
  broadcast everywhere;
* scoring pre-aggregates each doc to (doc, distinct token, multiplicity)
  before the vocabulary join, so the join stream is bounded by distinct
  tokens per doc × classes containing the token — never token positions;
  hot tokens ("the") are the AQE skew-join case, same posture as BM25's
  term join;
* out-of-vocabulary tokens never materialize rows: the matched join
  carries ``lp - unk`` deltas and the per-class unknown mass enters once
  as ``n_tok * unk_e4`` from the C-row broadcast — a doc's score is
  exact without densifying (token × class).

Cross-engine determinism: per-token log-probabilities are rounded to 4
decimals and summed as scaled integers (the lm.py grid), so the doc
score is addition-order independent and ``oracle.nb_classify_sql``
hashes identically; the argmax tie-breaks on the label string.

No reference analog; engine-tier curation surface (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.text import ws_tokens

NB_K = 1.0  # Laplace smoothing constant


def _e4(col):
    """round(x, 4) on the scaled-integer grid shared with the DuckDB
    mirror (lm.py idiom): ln() sees bit-identical doubles on both engines
    (inputs are exact longs), the 1e-4 grid absorbs last-ulp libm skew."""
    return F.round(col * 10000).cast("long")


def _split_pred(id_col: str, train_pct: int):
    return md5_long(F.col(id_col).cast("string")) % 100 < F.lit(train_pct)


def _model_from_counts(
    tok_counts: DataFrame, class_docs: DataFrame, k: float
) -> tuple[DataFrame, DataFrame]:
    """Finish the model from its two count frames: ``tok_counts`` =
    (label, tok, c) over the train split, ``class_docs`` = (label,
    n_docs). Class token totals and the vocab size are derived FROM
    ``tok_counts`` (reusing its shuffle); the grand doc total rides a
    window over the C-row class frame (no extra pass); everything
    model-sized is broadcast.

    Plan notes (BENCH/scan_audit.md lessons):
    * vocab references the aggregated ``c`` (``count_distinct`` over
      ``when(c >= 1, tok)``, a no-op on count rows) so Catalyst can't
      elide the inner aggregate's functions and break ReuseExchange;
    * ``tok_lp`` consumes ONE broadcast of the full ``classes`` frame —
      projecting after the join keeps the broadcast subtree canonically
      equal to the scorer's copy.
    """
    class_toks = tok_counts.groupBy("label").agg(F.sum("c").alias("n_toks"))
    vocab = tok_counts.agg(
        F.greatest(
            F.count_distinct(F.when(F.col("c") >= 1, F.col("tok"))), F.lit(1)
        ).alias("v")
    )
    classes = (
        class_docs.withColumn(
            "d", F.sum("n_docs").over(Window.partitionBy(F.lit(1)))
        )
        .join(class_toks, "label", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "n_docs",
            F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
            "v",
            _e4(F.log(F.col("n_docs") / F.col("d"))).alias("prior_e4"),
            _e4(
                F.log(
                    F.lit(k)
                    / (F.coalesce("n_toks", F.lit(0)) + F.lit(k) * F.col("v"))
                )
            ).alias("unk_e4"),
        )
    )
    tok_lp = tok_counts.join(F.broadcast(classes), "label").select(
        "tok",
        "label",
        (
            _e4(
                F.log(
                    (F.col("c") + F.lit(k)) / (F.col("n_toks") + F.lit(k) * F.col("v"))
                )
            )
            - F.col("unk_e4")
        ).alias("dlp_e4"),
    )
    return tok_lp, classes


def nb_model(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    *,
    train_pct: int = 80,
    k: float = NB_K,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB on the deterministic md5 hash-split.

    Returns ``(tok_lp, classes)``:

    * ``tok_lp``: (tok, label, dlp_e4) — the smoothed per-class token
      log-probability ``ln((c + k) / (n_toks + k·V))`` on the 1e-4 long
      grid, as its delta against the class's unknown-token mass (the form
      the scoring join consumes);
    * ``classes``: (label, n_docs, n_toks, v, prior_e4, unk_e4) — C rows,
      broadcast by the scorer. ``V`` is the distinct-token count of the
      whole train split (shared across classes, clamped ≥ 1).

    Labels with zero training docs simply have no rows — they can never
    be predicted, which is the honest behavior for an unseen class.

    This is the train-once/score-many entry point (its own train-split
    scans); ``nb_classify`` without a ``model`` fuses training into the
    scoring pass instead — see its plan note.
    """
    train = df.where(
        _split_pred(id_col, train_pct) & F.col(label_col).isNotNull()
    )
    toks = train.select(
        F.col(label_col).alias("label"),
        F.explode(ws_tokens(F.col(text_col))).alias("tok"),
    ).where(F.col("tok").isNotNull() & F.col("label").isNotNull())
    tok_counts = toks.groupBy("label", "tok").agg(F.count(F.lit(1)).alias("c"))
    class_docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return _model_from_counts(tok_counts, class_docs, k)


def nb_classify(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    *,
    train_pct: int = 80,
    k: float = NB_K,
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Classify every document under a multinomial NB model trained on the
    ``train_pct`` hash-split of the same frame — or under a pre-trained
    ``model`` (the ``nb_model`` pair), the train-once/score-many shape.

    score(doc, class) = prior + Σ_tok m·ln P(tok|class) on the 1e-4 long
    grid, computed as ``prior + n_tok·unk + Σ_matched m·(lp − unk)`` so
    OOV tokens cost no join rows. Prediction is the argmax (ties break on
    the label string ascending); ``margin`` is the runner-up gap — the
    standard confidence cut for filter pipelines ("keep only docs the
    classifier is sure are wiki-like").

    Output: (id, pred_label, score, margin, n_tok) for every input doc
    (zero-token docs score on priors alone). ``margin`` is NULL when the
    model has a single class. Empty train split ⇒ empty result.

    Plan note (self-train path): training token counts are derived FROM
    the scoring pre-aggregate, so the corpus's token explode is ONE scan
    + one exchange reused by both sides. The train-split predicate rides
    along as ``min(flag)`` — an *aggregated* column — because filtering
    on the raw md5 predicate would be pushed below the aggregate into
    the shared subtree and break ReuseExchange (the scan-audit lesson,
    BENCH/scan_audit.md; pinned in tests/test_plan_quality.py).
    """
    if model is not None:
        # Pre-trained path: the class table is C bounded rows by contract —
        # collect it once at plan build and UNROLL the per-class score as
        # literal-pivot aggregate columns. This removes the (id, label)
        # score-row expansion, its exchange, the spine join on (id, label)
        # and the per-id rank window entirely: one groupBy(id) + one spine
        # join on id, argmax/runner-up as an exact integer array sort
        # (score_e4 DESC, label ASC via struct(-score_e4, label) ASC —
        # the same total order the window used, on the same 1e-4 grid).
        tok_lp, classes = model
        cls = sorted(
            (r["label"], int(r["prior_e4"]), int(r["unk_e4"]))
            for r in classes.select("label", "prior_e4", "unk_e4").collect()
        )
        doc_toks = (
            df.select(
                F.col(id_col),
                # outer: the existing isNotNull(tok) drops the outer-added
                # rows; inner explode's inferred filter would re-tokenize
                # at the scan (dedup.minhash_signatures note)
                F.explode_outer(ws_tokens(F.col(text_col))).alias("tok"),
            )
            .where(F.col("tok").isNotNull())
            .groupBy(id_col, "tok")
            .agg(F.count(F.lit(1)).alias("m"))
        )
        spine = df.select(
            F.col(id_col),
            F.greatest(F.size(ws_tokens(F.col(text_col))), F.lit(0)).alias(
                "n_tok"
            ),
        )
        if not cls:
            # empty train split => empty result (same contract as the
            # crossJoin against an empty class frame)
            return spine.where(F.lit(False)).select(
                F.col(id_col),
                F.lit(None).cast("string").alias("pred_label"),
                F.lit(None).cast("double").alias("score"),
                F.lit(None).cast("double").alias("margin"),
                F.col("n_tok").cast("long").alias("n_tok"),
            )
        sums = (
            doc_toks.join(tok_lp, "tok")
            .groupBy(id_col)
            .agg(
                *[
                    F.sum(
                        F.when(
                            F.col("label") == lab, F.col("m") * F.col("dlp_e4")
                        )
                    ).alias(f"__s{i}")
                    for i, (lab, _p, _u) in enumerate(cls)
                ]
            )
        )
        n_tok_l = F.col("n_tok").cast("long")
        scored = spine.join(sums, id_col, "left").select(
            F.col(id_col),
            "n_tok",
            F.sort_array(
                F.array(
                    *[
                        F.struct(
                            (
                                -(
                                    F.lit(prior)
                                    + n_tok_l * F.lit(unk)
                                    + F.coalesce(f"__s{i}", F.lit(0))
                                )
                            ).alias("neg"),
                            F.lit(lab).alias("label"),
                        )
                        for i, (lab, prior, unk) in enumerate(cls)
                    ]
                )
            ).alias("__rank"),
        )
        best = F.col("__rank")[0]
        margin = (
            (F.col("__rank")[1]["neg"] - best["neg"]) / F.lit(10000.0)
            if len(cls) > 1
            else F.lit(None).cast("double")
        )
        return scored.select(
            F.col(id_col),
            best["label"].alias("pred_label"),
            (-best["neg"] / F.lit(10000.0)).alias("score"),
            margin.alias("margin"),
            F.col("n_tok").cast("long").alias("n_tok"),
        )
    else:
        # self-train classifies the LABELED corpus (a train-eval pass);
        # null-label rows are excluded up front, mirrored in the oracle —
        # score an unlabeled frame by passing a pre-trained ``model``.
        df = df.where(F.col(label_col).isNotNull())
        fl = _split_pred(id_col, train_pct).cast("int")
        doc_toks_l = (
            df.select(
                F.col(id_col),
                F.col(label_col).alias("__lab"),
                fl.alias("__fl"),
                F.explode(ws_tokens(F.col(text_col))).alias("tok"),
            )
            # uniform no-op filters: every consumer branch of this frame
            # canonicalizes identically, so ReuseExchange collapses them
            # to ONE corpus scan (BENCH/scan_audit.md lesson #1)
            .where(
                F.col(id_col).isNotNull()
                & F.col("__lab").isNotNull()
                & F.col("tok").isNotNull()
            )
            .groupBy(id_col, "__lab", "tok")
            .agg(F.count(F.lit(1)).alias("m"), F.min("__fl").alias("__fl"))
        )
        # no-op __fl >= 0 filter: the scoring side must REFERENCE the
        # aggregated flag or Catalyst elides min(__fl) from its copy of
        # the aggregate and the exchange stops being reusable
        # (scan-audit lesson #2, aggregate elision)
        doc_toks = doc_toks_l.where(F.col("__fl") >= 0).select(id_col, "tok", "m")
        tok_counts = (
            doc_toks_l.where(F.col("__fl") == 1)
            .groupBy(F.col("__lab").alias("label"), "tok")
            .agg(F.sum("m").alias("c"))
        )
        class_docs = (
            df.where(_split_pred(id_col, train_pct))
            .groupBy(F.col(label_col).alias("label"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        tok_lp, classes = _model_from_counts(tok_counts, class_docs, k)
    part1 = (
        doc_toks.join(tok_lp, "tok")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("m") * F.col("dlp_e4")).alias("s1"))
    )

    # greatest(…, 0): F.size(NULL) is -1, and a NULL-text doc should score
    # on priors alone, exactly like an empty one (DuckDB mirror: coalesce).
    spine = df.select(
        F.col(id_col),
        F.greatest(F.size(ws_tokens(F.col(text_col))), F.lit(0)).alias("n_tok"),
    )
    base = spine.crossJoin(
        F.broadcast(classes.select("label", "prior_e4", "unk_e4"))
    )
    scores = base.join(part1, [id_col, "label"], "left").select(
        F.col(id_col),
        "label",
        "n_tok",
        (
            F.col("prior_e4")
            + F.col("n_tok").cast("long") * F.col("unk_e4")
            + F.coalesce("s1", F.lit(0))
        ).alias("score_e4"),
    )

    w = Window.partitionBy(id_col).orderBy(
        F.col("score_e4").desc(), F.col("label").asc()
    )
    ranked = scores.select(
        F.col(id_col),
        "label",
        "n_tok",
        "score_e4",
        F.row_number().over(w).alias("__rk"),
        F.lead("score_e4").over(w).alias("__next"),
    ).where(F.col("__rk") == 1)
    return ranked.select(
        F.col(id_col),
        F.col("label").alias("pred_label"),
        (F.col("score_e4") / F.lit(10000.0)).alias("score"),
        ((F.col("score_e4") - F.col("__next")) / F.lit(10000.0)).alias("margin"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )


def nb_confusion(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    *,
    train_pct: int = 80,
    k: float = NB_K,
) -> DataFrame:
    """Held-out confusion matrix for the self-trained NB classifier — the
    eval telemetry every classifier gate needs before it filters anything:
    score only the docs OUTSIDE the train split (true held-out), cross
    predictions with true labels.

    Output: (label, pred_label, n, n_label, frac) — one row per observed
    (true, predicted) pair; ``frac = n / n_label`` is the row-normalized
    confusion rate (the diagonal is per-class recall). ``frac`` is exact
    at the 1e-4 grid (integer half-away-from-zero division) so the DuckDB
    mirror hashes identically.

    Scale shape: nb_classify's fused plan plus one C²-bounded aggregate —
    nothing new crosses the wire.
    """
    preds = nb_classify(
        df, id_col, text_col, label_col, train_pct=train_pct, k=k
    )
    heldout = df.where(
        ~_split_pred(id_col, train_pct) & F.col(label_col).isNotNull()
    ).select(F.col(id_col), F.col(label_col).alias("label"))
    cm = (
        heldout.join(preds.select(id_col, "pred_label"), id_col)
        .groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_label = Window.partitionBy("label")
    return (
        cm.withColumn("n_label", F.sum("n").over(per_label))
        .select(
            "label",
            "pred_label",
            F.col("n").cast("long").alias("n"),
            F.col("n_label").cast("long").alias("n_label"),
            # exact half-away-from-zero 1e-4 grid: (n*2e4 + n_label) DIV 2*n_label
            (
                F.expr("(n * 20000 + n_label) DIV (2 * n_label)") / F.lit(10000.0)
            ).alias("frac"),
        )
    )


def nb_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    *,
    target: str,
    min_margin: float = 0.0,
    train_pct: int = 80,
    k: float = NB_K,
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Apply the classifier as a corpus filter — the GPT-3/CCNet move:
    keep only documents the model assigns to ``target`` with at least
    ``min_margin`` nats of confidence over the runner-up class. With a
    pre-trained ``model`` whose classes are {curated-seed, random-crawl},
    this IS the WebText quality filter; self-trained on ``label_col`` it
    keeps the docs most unambiguously typical of one source.

    Returns the kept (id, score, margin, n_tok) rows. Single-class models
    have NULL margins and keep everything classified as ``target``
    (coalesce to +inf semantics: no runner-up means no ambiguity).
    """
    preds = nb_classify(
        df, id_col, text_col, label_col, train_pct=train_pct, k=k, model=model
    )
    return preds.where(
        (F.col("pred_label") == F.lit(target))
        & (F.coalesce(F.col("margin") >= F.lit(min_margin), F.lit(True)))
    ).select(id_col, "score", "margin", "n_tok")
