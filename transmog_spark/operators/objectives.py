"""Training-objective data prep (T5/UL2 span corruption).

The denoising-objective leg of a pre-training pipeline (Raffel et al.
2020 §3.1.4; UL2's denoiser mixtures): corrupt ~noise_density of each
document's tokens in contiguous spans, emit the sentinel-marked input
sequence and the span-recovery target sequence. No reference analog;
expressed Spark-first.

Determinism: span starts come from a seeded per-position hash threshold
(start probability = noise_density / span_len, so the expected corrupted
fraction ≈ noise_density) — no RNG state, bit-identical replay on any
cluster size and in the DuckDB oracle. Overlapping spans merge via the
cummax interval idiom (spans.py:65 — a window, never per-doc recursion).

Scale shape: ONE posexplode restricted by the hash predicate (only
flagged positions leave the explode), one (doc)-windowed merge over the
flagged rows (corpus-row-bounded, typically ~noise/span_len of tokens),
one groupBy collecting each doc's merged spans (bounded by spans/doc),
one co-partitioned join back, and a per-row rebuild (O(tokens · spans)
per row — the span list is small by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    *,
    noise_density: float = 0.15,
    span_len: int = 3,
    sentinel_base: int = 32000,
    seed: str = "",
) -> DataFrame:
    """Sentinel-marked (input_ids, target_ids) per document.

    input_ids = the uncorrupted tokens with each merged span replaced by
    one sentinel (sentinel_base + span index, in document order);
    target_ids = for each span, its sentinel followed by the corrupted
    tokens — the exact T5 encoder/decoder pair. Also emits ``n_spans``
    and ``corrupted_frac`` QA columns. Documents with no flagged spans
    pass through with input_ids = tokens and an empty target.
    """
    if not 0 < noise_density < 1:
        raise ValueError("noise_density must be in (0, 1)")
    if span_len < 1:
        raise ValueError("span_len must be >= 1")
    thresh = round(noise_density / span_len * 1000000)

    n = F.size(F.col(tokens_col))
    flagged = (
        df.select(
            F.col(id_col),
            n.alias("__n"),
            F.posexplode(F.col(tokens_col)).alias("__p", "__tok"),
        )
        .where(
            md5_long(
                F.concat(
                    F.lit(f"{seed}#"),
                    F.col(id_col).cast("string"),
                    F.lit("#"),
                    F.col("__p").cast("string"),
                )
            )
            % 1000000
            < thresh
        )
        .select(
            id_col,
            F.col("__p").alias("s"),
            F.least(F.col("__p") + span_len, F.col("__n")).alias("e"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("s")
    prev_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grp = F.sum(
        F.when(F.col("s") >= F.coalesce(prev_e, F.lit(0)), 1).otherwise(0)
    ).over(w)
    merged = (
        flagged.withColumn("__g", grp)
        .groupBy(id_col, "__g")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    spans = merged.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__raw")
    )

    out = df.join(spans, id_col, "left")
    sp = F.coalesce(
        # index each span in document order (sort_array already ordered)
        F.zip_with(
            F.col("__raw"),
            F.sequence(F.lit(0), F.greatest(F.size("__raw") - 1, F.lit(0))),
            lambda r, k: F.struct(
                r["s"].alias("s"), r["e"].alias("e"), k.alias("k")
            ),
        ),
        F.array().cast("array<struct<s:int,e:int,k:int>>"),
    )
    out = out.select(F.col(id_col), F.col(tokens_col), sp.alias("__spans"))

    toks = F.col(tokens_col)

    def _span_at(p):
        # try_element_at: NULL (not ANSI error) when no span contains p
        return F.try_element_at(
            F.filter(
                F.col("__spans"), lambda x: (x["s"] <= p) & (p < x["e"])
            ),
            F.lit(1),
        )

    idx = F.sequence(F.lit(0), F.size(toks) - 1)
    input_ids = F.flatten(
        F.transform(
            idx,
            lambda p: F.when(
                _span_at(p).isNull(), F.array(F.element_at(toks, p + 1))
            )
            .when(
                _span_at(p)["s"] == p,
                F.array(
                    (F.lit(sentinel_base) + _span_at(p)["k"]).cast("int")
                ),
            )
            .otherwise(F.array().cast("array<int>")),
        )
    )
    target_ids = F.flatten(
        F.transform(
            F.col("__spans"),
            lambda x: F.concat(
                F.array((F.lit(sentinel_base) + x["k"]).cast("int")),
                F.slice(toks, x["s"] + 1, x["e"] - x["s"]),
            ),
        )
    )
    corrupted = F.aggregate(
        F.col("__spans"), F.lit(0), lambda a, x: a + (x["e"] - x["s"])
    )
    nn = F.size(toks)
    return out.select(
        F.col(id_col),
        nn.cast("long").alias("n_tok"),
        F.size("__spans").cast("long").alias("n_spans"),
        F.when(nn > 0, F.round(corrupted.cast("double") / nn, 4))
        .otherwise(F.lit(0.0))
        .alias("corrupted_frac"),
        F.when(nn > 0, input_ids).otherwise(F.array().cast("array<int>")).alias("input_ids"),
        target_ids.alias("target_ids"),
    )


def mlm_mask(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    *,
    mask_rate: float = 0.15,
    mask_id: int = 32001,
    vocab: int = 32768,
    seed: str = "",
) -> DataFrame:
    """BERT-style masked-LM prep (Devlin et al. 2019 §3.1): select
    ``mask_rate`` of positions; of those 80% become ``mask_id``, 10% a
    deterministic pseudo-random token, 10% stay unchanged; ``labels``
    carries the original token at selected positions and -100 elsewhere
    (the standard ignore index).

    Fully per-row (zip tokens with positions, three seeded hash draws per
    position — select / branch / replacement), zero shuffle, deterministic
    replay; mirrored in ``oracle.mlm_mask_sql``.
    """
    if not 0 < mask_rate < 1:
        raise ValueError("mask_rate must be in (0, 1)")
    toks = F.col(tokens_col)

    def _h(tag: str, p):
        return md5_long(
            F.concat(
                F.lit(f"{seed}#{tag}#"),
                F.col(id_col).cast("string"),
                F.lit("#"),
                p.cast("string"),
            )
        )

    sel_grid = round(mask_rate * 1000000)
    zipped = F.zip_with(
        toks,
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda t, p: F.struct(t.alias("t"), p.alias("p")),
    )

    def _masked(z):
        t, p = z["t"], z["p"]
        selected = _h("sel", p) % 1000000 < sel_grid
        branch = _h("br", p) % 10
        rnd = (_h("rnd", p) % vocab).cast("int")
        new_tok = (
            F.when(branch < 8, F.lit(mask_id).cast("int"))
            .when(branch == 8, rnd)
            .otherwise(t)
        )
        return F.struct(
            F.when(selected, new_tok).otherwise(t).alias("x"),
            F.when(selected, t).otherwise(F.lit(-100).cast("int")).alias("y"),
        )

    staged = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tok"),
        F.when(F.size(toks) > 0, F.transform(zipped, _masked))
        .otherwise(F.array().cast("array<struct<x:int,y:int>>"))
        .alias("__m"),
    )
    return staged.select(
        id_col,
        "n_tok",
        F.transform("__m", lambda m: m["x"]).alias("input_ids"),
        F.transform("__m", lambda m: m["y"]).alias("labels"),
        F.size(F.filter("__m", lambda m: m["y"] != -100))
        .cast("long")
        .alias("n_masked"),
    )


DEFAULT_ROLE_TOKENS = {"system": 32010, "user": 32011, "assistant": 32012}


def sft_render(
    df: DataFrame,
    id_col: str = "conv_id",
    turns_col: str = "turns",
    *,
    vocab: int = 32768,
    role_tokens: dict[str, int] | None = None,
    unk_role_token: int = 32009,
    eot_token: int = 32013,
    mask_role: str = "assistant",
) -> DataFrame:
    """Chat-template rendering + SFT loss masking (the supervised
    fine-tuning data-prep leg): a conversation column
    ``array<struct<role, content>>`` becomes the flat training pair
    (input_ids, labels) — each turn rendered as
    ``[role marker] content-tokens [EOT]`` and labels = input_ids where
    the loss applies, -100 (the standard ignore index) elsewhere. Loss
    covers the ``mask_role`` (assistant) turns' CONTENT and EOT tokens
    only — role markers and non-assistant turns never carry loss (the
    HF/TRL DataCollatorForCompletionOnlyLM convention).

    Content tokenization is the engine's deterministic hash tokenizer
    (``text.tokenize_ids`` semantics inlined: lowercased whitespace
    tokens -> md5 % vocab), bit-identically mirrored in DuckDB. Roles
    missing from ``role_tokens`` render as ``unk_role_token`` and carry
    no loss.

    Output: (id, n_turns, n_tok, n_loss, input_ids, labels).

    Scale shape: fully per-row (one narrow projection, zero shuffle,
    no UDF). The per-turn struct array is referenced by two output
    expressions, so Catalyst evaluates the cheap per-row rebuild twice
    (the CLAUDE.md HOF-inlining note) — accepted: the work is a few
    hashes per token, and avoiding it would cost a shuffle.
    """
    rt = DEFAULT_ROLE_TOKENS if role_tokens is None else role_tokens
    role_map = F.create_map(
        *[F.lit(x) for k, v in sorted(rt.items()) for x in (k, v)]
    )

    def turn_struct(t):
        content_ids = F.transform(
            F.filter(F.split(F.lower(t["content"]), r"\s+"), lambda x: x != ""),
            lambda w: (md5_long(w) % vocab).cast("int"),
        )
        return F.struct(
            (t["role"] == F.lit(mask_role)).cast("int").alias("fl"),
            F.coalesce(
                role_map[t["role"]], F.lit(unk_role_token)
            ).cast("int").alias("mk"),
            content_ids.alias("ct"),
        )

    staged = df.select(
        F.col(id_col),
        F.size(F.col(turns_col)).alias("n_turns"),
        F.transform(F.col(turns_col), turn_struct).alias("__tt"),
    )
    # one flat (token, loss) stream; ids/labels project from it
    z = F.flatten(
        F.transform(
            F.col("__tt"),
            lambda s: F.concat(
                F.array(F.struct(s["mk"].alias("i"), F.lit(0).alias("m"))),
                F.transform(
                    s["ct"], lambda c: F.struct(c.alias("i"), s["fl"].alias("m"))
                ),
                F.array(
                    F.struct(
                        F.lit(eot_token).cast("int").alias("i"),
                        s["fl"].alias("m"),
                    )
                ),
            ),
        )
    )
    zc = staged.select(F.col(id_col), "n_turns", z.alias("__z"))
    return zc.select(
        F.col(id_col),
        "n_turns",
        F.size("__z").cast("long").alias("n_tok"),
        F.aggregate(
            F.col("__z"), F.lit(0).cast("long"), lambda a, e: a + e["m"]
        ).alias("n_loss"),
        F.transform(F.col("__z"), lambda e: e["i"]).alias("input_ids"),
        F.transform(
            F.col("__z"),
            lambda e: F.when(e["m"] == 1, e["i"]).otherwise(F.lit(-100)),
        ).alias("labels"),
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    *,
    fim_rate: float = 0.9,
    pre_token: int = 32020,
    suf_token: int = 32021,
    mid_token: int = 32022,
    seed: str = "",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, the
    code-model infilling objective; PSM format): for a seeded ``fim_rate``
    fraction of documents, two seeded uniform cut points split the token
    stream into prefix/middle/suffix and the document is re-serialized as
    ``[PRE] prefix [SUF] suffix [MID] middle`` — training then teaches the
    model to produce the middle given both context sides. Untransformed
    documents pass through verbatim (``fim_applied`` = false). Completes
    the objectives family: CLM (pack_*), MLM (mlm_mask), span corruption
    (T5/UL2), SFT (sft_render), FIM.

    Determinism: the apply decision and both cuts are seeded md5 draws per
    document (no RNG state) — bit-identical replay on any cluster size and
    in the DuckDB mirror. Cuts c1 <= c2 come from two independent draws in
    [0, n] put in order, so the middle length follows the order-statistic
    distribution of the paper's uniform two-point split.

    Scale shape: fully per-row (three slices + concat), zero shuffle, no
    UDF. Output: (id, n_tok, fim_applied, input_ids) — n_tok counts the
    ORIGINAL tokens; transformed rows carry n_tok + 3 ids.
    """
    if not 0 <= fim_rate <= 1:
        raise ValueError("fim_rate must be in [0, 1]")
    grid = round(fim_rate * 1_000_000)

    def h(tag: str) -> "F.Column":
        return md5_long(
            F.concat(
                F.lit(f"{seed}#{tag}#"), F.col(id_col).cast("string")
            )
        )

    n = F.size(F.col(tokens_col))
    staged = df.select(
        F.col(id_col),
        F.col(tokens_col).alias("__t"),
        n.alias("__n"),
        (h("apply") % 1_000_000 < grid).alias("__fim"),
        (h("c1") % (n.cast("long") + 1)).cast("int").alias("__a"),
        (h("c2") % (n.cast("long") + 1)).cast("int").alias("__b"),
    )
    staged = staged.select(
        F.col(id_col),
        "__t",
        "__n",
        "__fim",
        F.least("__a", "__b").alias("__c1"),
        F.greatest("__a", "__b").alias("__c2"),
    )
    marker = lambda t: F.array(F.lit(t).cast("int"))
    fim_ids = F.concat(
        marker(pre_token),
        F.expr("slice(__t, 1, __c1)"),
        marker(suf_token),
        F.expr("slice(__t, __c2 + 1, __n - __c2)"),
        marker(mid_token),
        F.expr("slice(__t, __c1 + 1, __c2 - __c1)"),
    )
    return staged.select(
        F.col(id_col),
        F.col("__n").cast("long").alias("n_tok"),
        F.col("__fim").alias("fim_applied"),
        F.when(F.col("__fim"), fim_ids).otherwise(F.col("__t")).alias("input_ids"),
    )


def ul2_mixture(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    *,
    shares: tuple[float, float, float] = (0.5, 0.25, 0.25),
    r_noise: float = 0.15,
    r_span: int = 3,
    x_noise: float = 0.5,
    x_span: int = 8,
    mode_tokens: tuple[int, int, int] = (32030, 32031, 32032),
    sentinel_base: int = 32000,
    seed: str = "",
) -> DataFrame:
    """UL2 mixture-of-denoisers prep (Tay et al. 2022; the PaLM-2
    objective): each document is deterministically assigned one denoiser
    mode by a seeded hash over ``shares`` — R (regular span corruption,
    T5-style), S (sequential / prefix-LM: one seeded cut, predict the
    continuation), X (extreme corruption: higher density, longer spans) —
    and re-serialized as (input_ids, target_ids) with the mode's paradigm
    token leading the input (the [R]/[S]/[X] convention).

    R and X reuse ``span_corruption`` verbatim (seeds namespaced per
    mode); S is a per-row prefix split at a seeded uniform cut. All three
    legs are zero-shuffle per-row transforms over disjoint slices — the
    union is a plan-level concatenation, no data movement.

    Output: (id, mode, n_tok, input_ids, target_ids).
    """
    if abs(sum(shares) - 1.0) > 1e-9:
        raise ValueError("shares must sum to 1")
    r_tok, s_tok, x_tok = mode_tokens
    hm = md5_long(
        F.concat(F.lit(f"{seed}#mode#"), F.col(id_col).cast("string"))
    ) % 1_000_000
    t1 = round(shares[0] * 1_000_000)
    t2 = t1 + round(shares[1] * 1_000_000)
    base = df.select(F.col(id_col), F.col(tokens_col), hm.alias("__hm"))

    def with_mode(out: DataFrame, mode: str, tok: int) -> DataFrame:
        return out.select(
            F.col(id_col),
            F.lit(mode).alias("mode"),
            F.col("n_tok"),
            F.concat(
                F.array(F.lit(tok).cast("int")), F.col("input_ids")
            ).alias("input_ids"),
            F.col("target_ids"),
        )

    r_in = base.where(F.col("__hm") < t1).select(id_col, tokens_col)
    x_in = base.where(F.col("__hm") >= t2).select(id_col, tokens_col)
    rout = with_mode(
        span_corruption(
            r_in, id_col, tokens_col,
            noise_density=r_noise, span_len=r_span,
            sentinel_base=sentinel_base, seed=f"{seed}#R",
        ),
        "R", r_tok,
    )
    xout = with_mode(
        span_corruption(
            x_in, id_col, tokens_col,
            noise_density=x_noise, span_len=x_span,
            sentinel_base=sentinel_base, seed=f"{seed}#X",
        ),
        "X", x_tok,
    )
    s_in = base.where((F.col("__hm") >= t1) & (F.col("__hm") < t2))
    n = F.size(F.col(tokens_col))
    hc = md5_long(
        F.concat(F.lit(f"{seed}#c#"), F.col(id_col).cast("string"))
    )
    staged = s_in.select(
        F.col(id_col),
        F.col(tokens_col).alias("__t"),
        n.alias("__n"),
        (hc % (n.cast("long") + 1)).cast("int").alias("__c"),
    )
    sout = staged.select(
        F.col(id_col),
        F.lit("S").alias("mode"),
        F.col("__n").cast("long").alias("n_tok"),
        F.concat(
            F.array(F.lit(s_tok).cast("int")), F.expr("slice(__t, 1, __c)")
        ).alias("input_ids"),
        F.expr("slice(__t, __c + 1, __n - __c)").alias("target_ids"),
    )
    return rout.unionByName(sout).unionByName(xout)
