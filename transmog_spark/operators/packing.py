"""Training-sequence assembly over pre-tokenized documents.

The north-rule input is an Iceberg table of pre-tokenized sequences
``(doc_id, tokens:array<int>, n_tok, source)``; a training pipeline's last
mile turns those documents into fixed-budget context windows. Three
operators, one per packing discipline:

* ``pack_concat``   — GPT-style concat-then-chunk: documents are laid out
  back-to-back per source (ordered by doc id) and cut every ``budget``
  tokens; a document may span several sequences. Exact distributed
  prefix-sum (two-level scan), zero Python.
* ``pack_greedy``   — no-split first-fit: a document that would overflow
  the open sequence starts a new one. The running-fill recurrence is
  inherently sequential, so it runs inside bounded blocks via an
  Arrow-batched ``applyInPandas`` (the documented controlled-sequential
  tier; everything outside the block is embarrassingly parallel).
* ``token_chunks``  — sliding windows of ``window`` tokens every
  ``stride`` over each document independently. Pure Column expressions.

Scale shapes (100 TB posture):

* ``pack_concat`` never runs a window over a whole source. The classic
  two-level scan: documents are bucketed into coarse blocks by the order
  key, cumsums are computed per ``(source, block)`` (fine-grained shuffle
  keys — a hot source spreads over many blocks), block totals form a tiny
  per-source frame whose own cumsum is broadcast back. A 10^12-row source
  costs two narrow shuffles of (source, block)-keyed longs. Size
  ``block_rows`` so the TOTAL block count stays broadcastable (rows/
  block_rows ≲ 10^6, i.e. ~10^6 rows per block at 10^12 rows — each block
  offset is ~24 bytes); the default suits bench-scale inputs.
* ``pack_greedy`` blocks are the unit of sequential work AND the unit of
  parallelism; sequences never cross block boundaries (deterministic,
  resumable, and exactly mirrorable in SQL). Block size bounds per-task
  memory: ``block_rows`` rows of (id, n_tok) per Arrow batch.
* ``token_chunks`` is a stateless per-row explode — no shuffle at all.

Reference parity note: the reference library (scottdraper8/transmog) stops
at flatten/extract (src/transmog/core/flattening.py:281-576); packing is
part of this engine's beyond-reference training-pipeline surface, gated by
DuckDB oracles like every other operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 2048
DEFAULT_BLOCK_ROWS = 4096
DEFAULT_HASH_BLOCKS = 1024

_NUMERIC_ID_TYPES = {"tinyint", "smallint", "int", "bigint", "long"}


def _slot_partitioned(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-partition a frame by ``keys`` into defaultParallelism
    partitions ahead of a Python-batched (applyInPandas) stage.

    AQE's size-based coalescing targets shuffle BYTES (~64 MB advisory),
    which is mis-calibrated for Python-bound stages: a few hundred KB of
    block metadata coalesces to ONE post-shuffle partition and the whole
    Arrow/pandas pass runs on one core (measured: pack_greedy 3.0s → the
    applyInPandas ran single-partition at bench scale).  A user-specified
    repartition count is exempt from AQE coalescing, so the stage always
    gets one partition per scheduler slot; at production data volumes the
    same count spreads the same way — partitioning a Python stage by
    available slots, not by shuffle bytes, is the right call at any scale
    (Python throughput per core, not shuffle read, is the bottleneck).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, *[F.col(k) for k in keys])


def _blocked(
    df: DataFrame, id_col: str, block_rows: int, hash_blocks: int
) -> DataFrame:
    """Coarse deterministic blocking of the order key.

    Numeric ids: ``block = floor(id / block_rows)`` — stateless and
    SQL-expressible; blocks need not be equally sized (sparse ids just make
    smaller blocks), they only need to be contiguous runs of the
    (source, id) order. Integer div (not float-divide-then-cast): exact at
    10^12-scale ids.

    String ids (the north-rule ``doc_id:string`` contract): hash-ordered
    blocking — ``block = md5_long(id) % hash_blocks`` — which DEFINES the
    packing order as ``(source, block, id)`` rather than pure lexicographic
    id order. Any deterministic total order is valid for training-sequence
    layout; this one needs no global sort or row_number spine (both
    scale-killers), is reproducible across engines (60-bit md5, mirrored in
    the DuckDB oracle), and is stable under repartition. Size
    ``hash_blocks`` so rows/hash_blocks ≈ the block granularity you want
    per source (~10^6 blocks at 10^12 rows keeps the per-source block-offset
    frame broadcastable).
    """
    dtype = dict(df.dtypes)[id_col]
    if dtype in _NUMERIC_ID_TYPES:
        return df.withColumn("block", F.expr(f"{id_col} div {block_rows}"))
    from transmog_spark.functions.hashing import md5_long

    # md5_long is 60-bit non-negative, so plain % never goes negative
    return df.withColumn(
        "block", (md5_long(F.col(id_col)) % hash_blocks).cast("long")
    )


def doc_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    source_col: str = "source",
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hash_blocks: int = DEFAULT_HASH_BLOCKS,
    positive_only: bool = False,
) -> DataFrame:
    """Exclusive prefix sum of token counts per source, in ``id_col`` order
    (string ids: in ``(block, id)`` order — see ``_blocked``).

    Two-level scan: local cumsum inside ``(source, block)`` + broadcast
    cumsum of block totals per source. Output adds ``tok_start`` (global
    offset of the document's first token within its source stream).

    ``positive_only=True`` drops ``ntok <= 0`` rows BEFORE the windows:
    zero-count rows contribute nothing to any prefix sum, so surviving
    rows get identical ``tok_start`` — but the filter applies UNIFORMLY
    below the shared exchange instead of being pushed into only the main
    branch's copy by the caller's post-filter, which would break the
    stage reuse described below. Callers that discard empty docs anyway
    (pack_concat) use it.
    """
    b = _blocked(df.select(source_col, id_col, ntok_col), id_col, block_rows, hash_blocks)
    if positive_only:
        b = b.where(F.col(ntok_col) > 0)
    # uniform null-key filter: the (source, block) inner join below drops
    # null-key rows anyway, but the join only INFERS isnotnull on the main
    # branch's copy of this subtree — pre-adding it on both keeps the two
    # exchange children canonically equal (stage reuse; see below)
    b = b.where(F.col(source_col).isNotNull() & F.col("block").isNotNull())

    local_w = (
        Window.partitionBy(source_col, "block")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # block totals as a SECOND window over the same (source, block)
    # partitioning instead of a separate groupBy branch: the old shape
    # re-evaluated the input a second time for the totals aggregate (its
    # partial-agg subtree can't ReuseExchange with the window's raw
    # exchange). Expressed as max(local_start + n_tok) — the last row's
    # exclusive prefix plus its own count, exactly the block total in
    # integer math — rather than sum(n_tok), ON PURPOSE: the sum form
    # lets column pruning drop the ordered local_start window (and the
    # id column) from the totals branch's copy of the subtree, the
    # exchange children stop being canonically equal, and the input is
    # generated twice again (observed via AQE stage probes). Referencing
    # local_start pins both branches to the identical exchange+sort, so
    # the totals frame is a distinct the partitioning already satisfies
    # over a REUSED stage.
    local = b.withColumn(
        "local_start", F.coalesce(F.sum(ntok_col).over(local_w), F.lit(0))
    ).withColumn(
        "__block_tokens",
        F.max(F.col("local_start") + F.col(ntok_col)).over(
            Window.partitionBy(source_col, "block")
        ),
    )

    totals = local.select(
        source_col, "block", F.col("__block_tokens").alias("block_tokens")
    ).distinct()
    # INCLUSIVE block cumsum, with the exclusive start recovered on the
    # main side as (incl - __block_tokens): the main branch then also
    # references __block_tokens, so column pruning cannot drop the
    # totals window from either copy — the final piece of keeping the
    # two subtrees canonically equal for stage reuse.
    blk_w = (
        Window.partitionBy(source_col)
        .orderBy("block")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offsets = totals.withColumn(
        "block_start_incl", F.sum("block_tokens").over(blk_w)
    ).select(source_col, "block", "block_start_incl")

    return local.join(F.broadcast(offsets), [source_col, "block"]).withColumn(
        "tok_start",
        (
            F.col("block_start_incl")
            - F.col("__block_tokens")
            + F.col("local_start")
        ).cast("long"),
    ).drop("local_start", "block_start_incl", "__block_tokens")


def pack_concat(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    source_col: str = "source",
    *,
    budget: int = DEFAULT_BUDGET,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hash_blocks: int = DEFAULT_HASH_BLOCKS,
) -> DataFrame:
    """Concat-then-chunk packing: per-source token stream cut every ``budget``.

    Emits one row per (document × training sequence it lands in):
    ``seq_id`` (per-source sequence index), ``seq_offset`` (where the span
    begins inside the sequence), ``doc_offset`` (where it begins inside the
    document) and ``span_len``. Empty documents are dropped (they occupy no
    tokens). All integer math — bit-identical across engines.
    """
    off = doc_offsets(
        df, id_col, ntok_col, source_col,
        block_rows=block_rows, hash_blocks=hash_blocks, positive_only=True,
    )
    first_seq = F.expr(f"tok_start div {budget}")
    last_seq = F.expr(f"(tok_start + {ntok_col} - 1) div {budget}")
    spans = off.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
    seq_lo = F.col("seq_id") * budget
    span_start = F.greatest(F.col("tok_start"), seq_lo)
    span_end = F.least(F.col("tok_start") + F.col(ntok_col), seq_lo + budget)
    return spans.select(
        source_col,
        F.col("seq_id").cast("long").alias("seq_id"),
        id_col,
        (span_start - seq_lo).cast("long").alias("seq_offset"),
        (span_start - F.col("tok_start")).cast("long").alias("doc_offset"),
        (span_end - span_start).cast("long").alias("span_len"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    source_col: str = "source",
    *,
    budget: int = DEFAULT_BUDGET,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hash_blocks: int = DEFAULT_HASH_BLOCKS,
) -> DataFrame:
    """First-fit no-split packing inside deterministic blocks.

    Within each ``(source, block)`` (ids ascending): keep a running fill;
    a document that would push the fill past ``budget`` opens a new
    sequence. Oversized documents (> budget) get a sequence of their own.
    Sequences never cross block boundaries, which makes the operator
    embarrassingly parallel across blocks and exactly reproducible in the
    DuckDB oracle (recursive CTE over the same blocks).

    Output: one row per document — ``block``, ``seq_in_block`` (sequence
    index within the block), ``seq_offset`` (token offset inside the
    sequence). Global sequence identity is the triple
    ``(source, block, seq_in_block)``.
    """
    b = _blocked(
        df.select(source_col, id_col, ntok_col).where(F.col(ntok_col) > 0),
        id_col,
        block_rows,
        hash_blocks,
    )
    id_type = dict(b.dtypes)[id_col]  # preserve string ids end-to-end
    schema = (
        f"{source_col} string, block long, {id_col} {id_type}, {ntok_col} long, "
        "seq_in_block long, seq_offset long"
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = pdf[ntok_col].to_numpy()
        seq = [0] * len(n)
        offs = [0] * len(n)
        cur_seq, cur_fill = 0, 0
        for i, ntok in enumerate(n):
            if cur_fill > 0 and cur_fill + int(ntok) > budget:
                cur_seq += 1
                cur_fill = 0
            seq[i] = cur_seq
            offs[i] = cur_fill
            cur_fill += int(ntok)
        out = pdf[[source_col, "block", id_col, ntok_col]].copy()
        out["seq_in_block"] = seq
        out["seq_offset"] = offs
        return out

    packed = (
        _slot_partitioned(b, source_col, "block")
        .groupBy(source_col, "block")
        .applyInPandas(fill, schema=schema)
    )
    return packed.select(
        source_col,
        F.col("block").cast("long"),
        id_col,
        F.col(ntok_col).cast("long"),
        "seq_in_block",
        "seq_offset",
    )


def pack_stats(
    packed: DataFrame,
    ntok_col: str = "n_tok",
    source_col: str = "source",
    *,
    budget: int = DEFAULT_BUDGET,
) -> DataFrame:
    """Packing-efficiency telemetry over ``pack_greedy`` output.

    The number every packing change is judged by in a training-data
    pipeline: how much of the sequence budget actually carries tokens
    (fill rate), how much is padding waste, and how fragmented the bins
    are. Per source: ``n_seqs``, ``n_docs``, ``total_tokens``,
    ``oversized_seqs`` (single-doc sequences longer than the budget —
    they truncate or stream at train time), ``min/max_seq_tokens``,
    ``waste_tokens`` (unused capacity across non-oversized sequences,
    i.e. the padding the trainer pays), ``fill_rate`` and
    ``docs_per_seq`` (round-4 ratios of exact longs).

    Scale shape: one map-side-combined groupBy on (source, block,
    seq_in_block) — the key ``pack_greedy`` already partitioned by — then
    a per-source agg of a handful of longs. All integer math until the
    two final rounded divisions, so the DuckDB mirror is bit-identical.
    """
    per_seq = packed.groupBy(source_col, "block", "seq_in_block").agg(
        F.sum(ntok_col).alias("__tok"),
        F.count(F.lit(1)).alias("__docs"),
        F.max((F.col(ntok_col) > budget).cast("int")).alias("__over"),
    )
    tok = F.col("__tok")
    return per_seq.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("__docs").cast("long").alias("n_docs"),
        F.sum("__tok").cast("long").alias("total_tokens"),
        F.sum("__over").cast("long").alias("oversized_seqs"),
        F.min("__tok").cast("long").alias("min_seq_tokens"),
        F.max("__tok").cast("long").alias("max_seq_tokens"),
        F.sum(F.greatest(F.lit(budget) - tok, F.lit(0)))
        .cast("long")
        .alias("waste_tokens"),
        F.round(
            F.sum("__tok").cast("double") / (F.count(F.lit(1)) * budget), 4
        ).alias("fill_rate"),
        F.round(F.sum("__docs").cast("double") / F.count(F.lit(1)), 4).alias(
            "docs_per_seq"
        ),
    )


def pack_assemble(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    source_col: str = "source",
    *,
    budget: int = DEFAULT_BUDGET,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hash_blocks: int = DEFAULT_HASH_BLOCKS,
) -> DataFrame:
    """Materialized concat-then-chunk training sequences.

    ``pack_concat`` emits span *metadata* (which document slice lands where);
    this operator joins the spans back to the token arrays and assembles the
    actual fixed-budget ``array<int>`` sequences a trainer consumes: one row
    per ``(source, seq_id)`` with ``tokens`` = the document slices
    concatenated in ``seq_offset`` order. Every sequence is exactly
    ``budget`` tokens except the final (partial) one per source — the
    sequences are a partition of each source's token stream in doc-id order.

    Scale shape: the span plan is computed on a skinny ``(source, id,
    n_tok)`` projection (two narrow shuffles of longs, see
    ``doc_offsets``); the token arrays move through exactly two wide
    shuffles — the doc-id join and the ``(source, seq_id)`` assembly
    groupBy, each carrying the corpus token volume once. Per-group state in
    the assembly agg is bounded by ``budget`` tokens (a sequence's pieces
    never exceed the budget), so ``collect_list`` here is safe at any
    corpus size.
    """
    skinny = df.select(source_col, id_col, F.size(F.col(tokens_col)).alias("__ntok"))
    spans = pack_concat(
        skinny, id_col, "__ntok", source_col,
        budget=budget, block_rows=block_rows, hash_blocks=hash_blocks,
    )
    # join on (source, id): doc ids need only be unique per source
    joined = spans.join(
        df.select(source_col, id_col, tokens_col), [source_col, id_col]
    )
    # SQL slice accepts column bounds (F.slice needs plan-time ints)
    piece = F.expr(f"slice({tokens_col}, doc_offset + 1, span_len)")
    parts = joined.select(
        source_col,
        "seq_id",
        F.struct(F.col("seq_offset").alias("o"), piece.alias("p")).alias("__op"),
    )
    # array_sort on array<struct> orders by the first field (seq_offset,
    # unique within a sequence) — deterministic assembly without a sort node
    assembled = parts.groupBy(source_col, "seq_id").agg(
        F.flatten(
            F.transform(F.array_sort(F.collect_list("__op")), lambda s: s["p"])
        ).alias(tokens_col)
    )
    return assembled.select(
        source_col,
        "seq_id",
        F.size(F.col(tokens_col)).cast("long").alias("seq_len"),
        tokens_col,
    )


def pack_assemble_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    source_col: str = "source",
    *,
    budget: int = DEFAULT_BUDGET,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hash_blocks: int = DEFAULT_HASH_BLOCKS,
) -> DataFrame:
    """Materialized greedy (no-split) training sequences.

    ``pack_greedy`` assigns whole documents to sequences; this joins the
    assignments back to the token arrays and emits one row per sequence
    ``(source, block, seq_in_block)`` with the member documents' tokens
    concatenated in ``seq_offset`` order. No slicing — documents are never
    split, so ``seq_len <= budget`` except when a single oversized document
    (> budget tokens) occupies a sequence alone.

    Scale shape: assignment runs on a skinny projection; token arrays move
    through the doc-id join and one bounded-group assembly groupBy (state
    per group <= max(budget, longest document) tokens).
    """
    skinny = df.select(source_col, id_col, F.size(F.col(tokens_col)).alias("__ntok"))
    asg = pack_greedy(
        skinny, id_col, "__ntok", source_col,
        budget=budget, block_rows=block_rows, hash_blocks=hash_blocks,
    )
    # join on (source, id): doc ids need only be unique per source
    joined = asg.join(
        df.select(source_col, id_col, tokens_col), [source_col, id_col]
    )
    parts = joined.select(
        source_col,
        "block",
        "seq_in_block",
        F.struct(F.col("seq_offset").alias("o"), F.col(tokens_col).alias("p")).alias("__op"),
    )
    assembled = parts.groupBy(source_col, "block", "seq_in_block").agg(
        F.flatten(
            F.transform(F.array_sort(F.collect_list("__op")), lambda s: s["p"])
        ).alias(tokens_col)
    )
    return assembled.select(
        source_col,
        "block",
        "seq_in_block",
        F.size(F.col(tokens_col)).cast("long").alias("seq_len"),
        tokens_col,
    )


def pack_masks(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    source_col: str = "source",
    *,
    budget: int = DEFAULT_BUDGET,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hash_blocks: int = DEFAULT_HASH_BLOCKS,
) -> DataFrame:
    """Packed training sequences WITH the per-token attention/loss metadata
    a trainer needs to treat each packed document independently:

    * ``segment_ids``  — 1-based ordinal of the document piece each token
      belongs to (the block-diagonal attention mask spec: attend only
      within your segment; FlashAttention's varlen ``cu_seqlens`` is the
      prefix sum of ``piece_lens`` below).
    * ``position_ids`` — the token's position WITHIN ITS DOCUMENT, so a
      document split across sequences continues counting (piece 2 of a
      split doc starts at its ``doc_offset``, not 0) and rotary/alibi
      positions stay faithful to the original document.
    * ``loss_mask``    — 0 where ``position_ids`` == 0 (a document's first
      token has no left context inside a block-diagonal mask, so causal LM
      loss on it is noise), 1 elsewhere.
    * ``piece_lens``   — per-piece token counts in sequence order
      (``cu_seqlens`` = exclusive prefix sum with a leading 0).

    Same assembly as ``pack_assemble`` (identical spans, joins, bounded
    groups); the mask arrays are derived at assembly time from the sorted
    piece structs, so they are exactly aligned with ``tokens`` by
    construction. The piece structs are materialized by the aggregation
    into a real column FIRST and the four flattens projected from it in a
    separate select — referencing an agg output is a cheap column read,
    whereas aliasing the sort expression into four lambdas would make
    Catalyst re-evaluate the sort four times (see CLAUDE.md codegen note).

    Scale shape: identical to ``pack_assemble`` — skinny span plan, token
    arrays cross exactly two wide shuffles, per-group state bounded by
    ``budget`` tokens; the mask arrays add O(budget) integers per output
    row, all JVM-side Column expressions.
    """
    skinny = df.select(source_col, id_col, F.size(F.col(tokens_col)).alias("__ntok"))
    spans = pack_concat(
        skinny, id_col, "__ntok", source_col,
        budget=budget, block_rows=block_rows, hash_blocks=hash_blocks,
    )
    joined = spans.join(
        df.select(source_col, id_col, tokens_col), [source_col, id_col]
    )
    piece = F.expr(f"slice({tokens_col}, doc_offset + 1, span_len)")
    parts = joined.select(
        source_col,
        "seq_id",
        F.struct(
            F.col("seq_offset").alias("o"),
            F.col("doc_offset").alias("do"),
            piece.alias("p"),
        ).alias("__op"),
    )
    # array_sort over array<struct> orders by the leading field (seq_offset,
    # unique within a sequence); the sorted pieces land in a REAL column so
    # the four projections below each read it instead of re-sorting.
    assembled = parts.groupBy(source_col, "seq_id").agg(
        F.array_sort(F.collect_list("__op")).alias("__pieces")
    )
    pieces = F.col("__pieces")
    positions = F.flatten(
        F.transform(
            # both sequence() bounds cast to long explicitly — mixed
            # long/int bounds are a plan-build type error on some versions
            pieces,
            lambda s: F.sequence(
                s["do"].cast("long"),
                (s["do"] + F.size(s["p"]).cast("long") - 1).cast("long"),
            ),
        )
    )
    out = assembled.select(
        source_col,
        "seq_id",
        F.flatten(F.transform(pieces, lambda s: s["p"])).alias(tokens_col),
        F.flatten(
            F.transform(
                pieces,
                lambda s, i: F.array_repeat((i + 1).cast("long"), F.size(s["p"])),
            )
        ).alias("segment_ids"),
        positions.alias("position_ids"),
        F.transform(pieces, lambda s: F.size(s["p"]).cast("long")).alias("piece_lens"),
    )
    return out.select(
        source_col,
        "seq_id",
        F.size(F.col(tokens_col)).cast("long").alias("seq_len"),
        tokens_col,
        "segment_ids",
        "position_ids",
        F.transform(
            F.col("position_ids"), lambda p: (p != 0).cast("long")
        ).alias("loss_mask"),
        "piece_lens",
    )


def token_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    *,
    window: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Sliding context windows over each document's token array.

    Windows start at 0, stride, 2·stride, …; the final window is truncated
    to the document end (kept only if non-empty). A document shorter than
    ``window`` yields exactly one (truncated) chunk. Stateless explode —
    no shuffle; the chunk arrays stay JVM-side.

    Output: ``chunk_id`` (per-doc window index), ``chunk_len``, ``chunk``
    (array<int> slice). Callers feeding the driver gate should scalarize
    ``chunk`` (md5 of the joined ids) — see ``__spark_entry__``.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    n = F.size(F.col(tokens_col))
    # last chunk index via integer ceil-div — exact parity with the oracle
    last_chunk = (
        F.when(n <= window, F.lit(0))
        .otherwise(F.expr(f"(size({tokens_col}) - {window} + {stride} - 1) div {stride}"))
        .cast("long")
    )
    src = df.where(n > 0).withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0).cast("long"), last_chunk))
    )
    # F.slice needs a plan-time int length; F.expr accepts column bounds.
    chunk = F.expr(
        f"slice({tokens_col}, chunk_id * {stride} + 1, {window})"
    )
    return src.select(
        id_col,
        F.col("chunk_id").cast("long"),
        F.size(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk"),
    )


def boundary_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_tokens: int = 128,
) -> DataFrame:
    """Sentence-boundary-aware greedy chunking of long documents.

    The RAG/pretraining long-doc splitter that ``token_chunks`` (fixed
    stride, cuts mid-sentence) is not: sentences (``text.sentences``) are
    packed left-to-right into chunks, starting a new chunk when adding the
    next sentence would exceed ``max_tokens``; a single sentence longer
    than the budget becomes its own (overflowing) chunk — greedy
    first-fit-in-order, never reordered, so chunk text reads contiguously.

    Scale shape: entirely per-row — sentence split, the greedy fold
    (``F.aggregate`` over the sentence array), and chunk assembly all run
    inside one narrow projection; only the final posexplode widens rows.
    ZERO shuffles, no window, no join. Per-row cost is O(sentences ×
    chunks) for the assembly transform — fine for real document lengths
    (the fold itself is O(sentences)).

    Output: ``chunk_id`` (per-doc, 0-based, in document order),
    ``n_sents``, ``chunk_tokens`` (whitespace tokens), ``chunk`` (text).
    DuckDB mirror: ``oracle.boundary_chunks_sql`` — a recursive-CTE fold,
    because DuckDB 1.0's list_reduce corrupts struct accumulators that
    carry a growing list (see the mirror's docstring).
    """
    from transmog_spark.operators.text import sentences, ws_tokens

    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")

    sl = F.transform(
        F.filter(sentences(F.col(text_col)), lambda s: F.trim(s) != ""),
        lambda s: F.struct(
            F.trim(s).alias("s"), F.size(ws_tokens(s)).alias("l")
        ),
    )
    # stage: __sl referenced by fold + zip + assembly (Catalyst would
    # otherwise inline the split/transform into every use)
    staged = df.select(F.col(id_col), sl.alias("__sl")).where(
        F.size("__sl") > 0
    )
    init = F.struct(
        F.lit(0).alias("len"),
        F.array().cast("array<int>").alias("ids"),
        F.lit(0).alias("last"),
    )
    fold = F.aggregate(
        F.col("__sl"),
        init,
        lambda acc, e: F.when(
            (acc["len"] > 0) & (acc["len"] + e["l"] > max_tokens),
            F.struct(
                e["l"].alias("len"),
                F.concat(acc["ids"], F.array(acc["last"] + 1)).alias("ids"),
                (acc["last"] + 1).alias("last"),
            ),
        ).otherwise(
            F.struct(
                (acc["len"] + e["l"]).alias("len"),
                F.concat(acc["ids"], F.array(acc["last"])).alias("ids"),
                acc["last"].alias("last"),
            )
        ),
    )
    staged = staged.select(id_col, "__sl", fold["ids"].alias("__ids"))
    zipped = F.zip_with(
        F.col("__sl"),
        F.col("__ids"),
        lambda e, cid: F.struct(
            cid.alias("cid"), e["s"].alias("s"), e["l"].alias("l")
        ),
    )
    staged = staged.select(id_col, zipped.alias("__z"))

    def _chunk(cid):
        members = F.filter(F.col("__z"), lambda z: z["cid"] == cid)
        return F.struct(
            F.size(members).cast("long").alias("n_sents"),
            F.aggregate(
                members, F.lit(0), lambda a, z: a + z["l"]
            ).cast("long").alias("chunk_tokens"),
            F.array_join(
                F.transform(members, lambda z: z["s"]), " "
            ).alias("chunk"),
        )

    staged = staged.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.element_at(F.transform(F.col("__z"), lambda z: z["cid"]), -1),
                ),
                _chunk,
            )
        ).alias("chunk_id", "c"),
    )
    return staged.select(
        id_col,
        F.col("chunk_id").cast("long"),
        F.col("c.n_sents"),
        F.col("c.chunk_tokens"),
        F.col("c.chunk"),
    )


def pack_bestfit(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    source_col: str = "source",
    *,
    budget: int = DEFAULT_BUDGET,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hash_blocks: int = DEFAULT_HASH_BLOCKS,
) -> DataFrame:
    """Best-fit-decreasing no-split packing inside deterministic blocks —
    ``pack_greedy``'s higher-fill sibling (classic BFD bin packing:
    ≤ 11/9·OPT + 4 bins vs first-fit-in-arrival-order's looser bound;
    measured against ``pack_stats`` it buys a few points of fill rate and
    fewer sequences for the same corpus, i.e. fewer padded tokens the
    trainer pays for).

    Within each ``(source, block)``: documents sorted by (n_tok DESC, id
    ASC), each placed into the open sequence with the HIGHEST fill that
    still accommodates it (the tightest fit; ties -> lowest sequence
    index), else a new sequence. Oversized documents (> budget) always
    open their own sequence and are never candidates again. Same output
    contract as ``pack_greedy`` (``block``, ``seq_in_block``,
    ``seq_offset``; identity = (source, block, seq_in_block)) — note
    ``seq_offset`` orders tokens by PLACEMENT (size-descending), the
    deliberate BFD layout.

    Scale shape: identical to ``pack_greedy`` — embarrassingly parallel
    blocked applyInPandas, no shuffle beyond the block grouping — but
    per-block cost is O(docs_per_block · seqs_per_block) vs first-fit's
    O(docs_per_block): with a small budget and the default 4096-row
    blocks that is a few 10^6 Python ops per block; shrink block_rows (or
    keep first-fit) when docs are tiny relative to the budget — which is
    exactly the regime where BFD buys nothing anyway
    (BENCH/packing_fill.md). Mirrored exactly by a recursive-CTE walk
    carrying the bin-fill list (oracle.pack_bestfit_sql).
    """
    b = _blocked(
        df.select(source_col, id_col, ntok_col).where(F.col(ntok_col) > 0),
        id_col,
        block_rows,
        hash_blocks,
    )
    id_type = dict(b.dtypes)[id_col]
    schema = (
        f"{source_col} string, block long, {id_col} {id_type}, {ntok_col} long, "
        "seq_in_block long, seq_offset long"
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [ntok_col, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        fills: list[int] = []
        seq = [0] * len(pdf)
        offs = [0] * len(pdf)
        for i, ntok in enumerate(pdf[ntok_col].to_numpy()):
            n = int(ntok)
            best_j = -1
            if n <= budget:
                best_fill = -1
                for j, f in enumerate(fills):
                    if f + n <= budget and f > best_fill:
                        best_fill, best_j = f, j
            if best_j < 0:
                best_j = len(fills)
                fills.append(0)
            seq[i] = best_j
            offs[i] = fills[best_j]
            fills[best_j] += n
        out = pdf[[source_col, "block", id_col, ntok_col]].copy()
        out["seq_in_block"] = seq
        out["seq_offset"] = offs
        return out

    packed = (
        _slot_partitioned(b, source_col, "block")
        .groupBy(source_col, "block")
        .applyInPandas(fill, schema=schema)
    )
    return packed.select(
        source_col,
        F.col("block").cast("long"),
        id_col,
        F.col(ntok_col).cast("long"),
        "seq_in_block",
        "seq_offset",
    )


def length_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    *,
    batch_size: int,
    bucket_bounds: tuple[int, ...] = (64, 128, 256, 512, 1024, 2048),
    seed: str = "lb",
) -> DataFrame:
    """Length-bucketed batch assignment — the ``group_by_length`` data-
    loader prep (HF Trainer's LengthGroupedSampler, the padded-batch dual
    of the packing family): sequences are bucketed by length, shuffled
    deterministically INSIDE their bucket (seeded hash, so batch
    composition is reproducible on any cluster size/engine), and cut
    into batches of ``batch_size``; each batch pads to its own maximum
    instead of the global one.

    Output: one row per document — ``bucket`` (index into
    ``bucket_bounds``; the last bucket is open-ended), ``batch`` (global
    batch id = bucket * 2^40 + in-bucket batch ordinal), ``pos_in_batch``,
    ``batch_max_tok`` (the pad target) and ``pad_waste`` (padding tokens
    this row pays). Zero-token/NULL rows are excluded.

    Scale shape: one hash-ranked window per bucket (the shuffle key is
    the bucket — bounded key count; row_number inside is the unavoidable
    in-bucket order) + one (bucket, batch) max broadcast back via a
    window over the same partitioning — ONE Exchange + ONE Sort for
    everything (shared window spine; plan-pinned). The LAST batch of a
    bucket may run short — reported, not silently merged.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    from pyspark.sql import Window

    from transmog_spark.functions.hashing import md5_long

    nt = F.col(ntok_col).cast("long")
    bucket = F.lit(len(bucket_bounds))
    for i, b in enumerate(reversed(bucket_bounds)):
        bucket = F.when(nt <= b, F.lit(len(bucket_bounds) - 1 - i)).otherwise(
            bucket
        )
    h = md5_long(F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col), nt.alias("__nt"), bucket.alias("bucket"), h.alias("__h")
    ).where(nt.isNotNull() & (nt > 0))
    w = Window.partitionBy("bucket").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    rn = F.row_number().over(w) - 1
    base = base.select(
        F.col(id_col),
        "__nt",
        "bucket",
        (rn % batch_size).alias("pos_in_batch"),
        (
            F.col("bucket").cast("long") * F.lit(1 << 40)
            + (rn / batch_size).cast("long")
        ).alias("batch"),
    )
    wb = Window.partitionBy("bucket", "batch")
    mx = F.max("__nt").over(wb)
    return base.select(
        F.col(id_col),
        F.col("__nt").alias(ntok_col),
        "bucket",
        "batch",
        "pos_in_batch",
        mx.alias("batch_max_tok"),
        (mx - F.col("__nt")).alias("pad_waste"),
    )
