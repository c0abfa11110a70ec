"""Streaming document curation: the quality gate over a document stream.

The batch ``quality_gate`` computes two per-document aggregations
(repetition profile, LM perplexity) that Structured Streaming cannot run
in append mode — document ids are not event time, so there is no
watermark under which a per-doc groupBy could finalize. The correct
streaming shape is therefore ``foreachBatch``: each micro-batch is a
bounded DataFrame, the full batch operator runs on it unchanged, and the
LM counts come from a model trained ONCE on a static reference corpus
(``ngram_lm_counts``) joined stream-static — which is also the honest
semantics for a stream (a model self-trained on each micro-batch would
drift with batch boundaries and make verdicts trigger-dependent).

Batch ≡ stream parity holds exactly because every micro-batch evaluates
the identical plan against the identical static model — pinned by
``tests/test_streaming_quality.py`` over an availableNow file-source run.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from transmog_spark.operators.lm import ngram_lm_counts
from transmog_spark.operators.quality import quality_gate


def quality_gate_foreach_batch(
    sink: Callable[[DataFrame, int], None],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm_model: tuple[DataFrame, DataFrame, DataFrame],
    **thresholds,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` handler: per micro-batch, run the batch
    ``quality_gate`` against the static ``lm_model`` and hand the verdict
    frame to ``sink`` (write, upsert, alert — caller's choice).

    The model frames should be persisted (or written to parquet and
    re-read) by the caller: every micro-batch joins against them, and an
    unpersisted lineage would recompute the training aggregation per
    trigger.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = quality_gate(
            batch_df, id_col, text_col, lm_model=lm_model, **thresholds
        )
        sink(verdicts, batch_id)

    return handle


def train_reference_model(
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    train_pct: int = 100,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the stream's reference bigram model on a static corpus and
    (by default) persist the three count frames — they are joined by every
    micro-batch. ``train_pct=100`` uses the whole reference corpus (the
    batch operator's 80/20 self-split exists to avoid scoring docs on
    themselves; a disjoint reference corpus has no such leak)."""
    model = ngram_lm_counts(reference, id_col, text_col, train_pct=train_pct)
    if persist:
        for frame in model:
            frame.persist()
    return model


def nb_gate_foreach_batch(
    sink: Callable[[DataFrame, int], None],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    nb_model: tuple[DataFrame, DataFrame],
    target: str,
    min_margin: float = 0.0,
) -> Callable[[DataFrame, int], None]:
    """Streaming classifier admission: per micro-batch, score the batch
    under a static pre-trained NB model (``operators.nb.nb_model``, the
    pair persisted by the caller like the LM frames above) and keep only
    docs predicted ``target`` with >= ``min_margin`` nats of margin —
    the GPT-3-style quality filter as a stream admission gate.

    Same foreachBatch rationale as the quality gate: per-doc argmax is
    not watermarkable, and a model self-trained per micro-batch would
    make admissions trigger-dependent; a static model makes batch ≡
    stream exact (pinned in tests/test_streaming_quality.py).
    """
    from transmog_spark.operators.nb import nb_gate

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        kept = nb_gate(
            batch_df,
            id_col,
            text_col,
            target=target,
            min_margin=min_margin,
            model=nb_model,
        )
        sink(kept, batch_id)

    return handle
