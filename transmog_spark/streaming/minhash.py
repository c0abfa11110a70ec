"""Streaming near-dup ADMISSION over the incremental MinHash-LSH store.

``minhash_admission_foreach_batch`` closes the one gap the streaming
curation story used to hand entirely to batch compaction
(streaming/curation.py): cross-batch NEAR-duplicate detection at arrival
time. Per micro-batch it (1) probes the batch against the band store of
everything admitted so far — cost ∝ batch × probed buckets, never corpus
(operators/minhash_index.py:minhash_probe's partition-pruned,
broadcast-probe plan) — writing the matches to ``matches_path``; then
(2) folds the batch into the store (append, cost ∝ batch). A consumer
anti-joins its curated output on ``probe_id`` to drop flagged arrivals.

Scope, stated honestly: the probe sees PRIOR batches only — intra-batch
near-dups are the micro-batch's own job (``dedupe_stream`` /
``curate_batch`` handle exact and in-batch fuzzy); and admission is
candidate-level (signature-agreement Jaccard estimate), with the
periodic ``jobs/compact_curated.py`` sweep remaining the exact
ground-truth pass. This is the GPT-3/RefinedWeb-style admission filter,
not a replacement for compaction.

Idempotency: the handler records the last applied ``batch_id`` in the
index meta and SKIPS replayed batches (foreachBatch is at-least-once) —
same guard and same non-transactional crash window as
streaming/bm25.py, documented there.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transmog_spark.operators.minhash_index import (
    META_NAME,
    minhash_index,
    minhash_index_update,
    minhash_probe,
)


def minhash_admission_foreach_batch(
    index_path: str,
    matches_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    n_buckets: int = 64,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` handler. Attach with::

        stream.writeStream.foreachBatch(
            minhash_admission_foreach_batch("/warehouse/mh", "/warehouse/dups")
        ).option("checkpointLocation", chk).start()

    ``matches_path`` accumulates (probe_id, match_id, sig_sim, batch_id)
    parquet — every arrival flagged as a near-dup of an already-admitted
    document, replay-safe via the batch-id guard.
    """
    meta_path = os.path.join(index_path, META_NAME)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not os.path.exists(meta_path):
            # first batch: nothing admitted yet, nothing to probe
            minhash_index(
                batch_df, index_path, id_col, text_col,
                shingle_n=shingle_n, num_hashes=num_hashes,
                bands=bands, n_buckets=n_buckets,
            )
        else:
            with open(meta_path) as fh:
                meta = json.load(fh)
            if meta.get("last_batch_id", -1) >= batch_id:
                return  # committed-batch replay after restart: exact skip
            # prune=False: a micro-batch's band keys cover essentially
            # every kb bucket, so the pruning action would cost a full
            # extra serial stage chain and prune nothing
            matches = minhash_probe(
                spark, index_path, batch_df, id_col, text_col,
                threshold=threshold, max_bucket=max_bucket, prune=False,
            )
            matches.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(matches_path)
            minhash_index_update(spark, batch_df, index_path, id_col, text_col)
        with open(meta_path) as fh:
            meta = json.load(fh)
        meta["last_batch_id"] = batch_id
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_path)

    return handle
