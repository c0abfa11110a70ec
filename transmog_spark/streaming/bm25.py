"""Streaming maintenance of the incremental BM25 index.

``bm25_index_foreach_batch`` keeps a v2 ``bm25_index`` fresh from a
document stream: the first micro-batch builds the index, every later one
folds in via ``bm25_index_update`` (cost ∝ batch, never corpus — the
index stores immutable per-doc postings plus exact global counters, so
increments are bit-identical to rebuilds).

Idempotency: the handler records the last applied ``batch_id`` in the
index meta and SKIPS replayed batches — Structured Streaming re-delivers
the last batch after a restart even when it committed (foreachBatch is
at-least-once), and re-applying would double-count its documents exactly
as a duplicated input would in a full rebuild. The guard makes the
common replay-of-committed-batch case exact; a crash INSIDE an update
(after the postings append, before the meta flip) still re-applies that
batch on retry — the same non-transactional-sink window every
foreachBatch writer has, documented rather than hidden. Contract: the
stream must deliver NEW documents (append-only corpus), e.g. behind
``dedupe_stream`` on the content hash.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame

from transmog_spark.operators.corpus import (
    BM25_B,
    BM25_K1,
    bm25_index,
    bm25_index_update,
)


def bm25_index_foreach_batch(
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    term_buckets: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` handler. Attach with::

        stream.writeStream.foreachBatch(
            bm25_index_foreach_batch("/warehouse/bm25")
        ).option("checkpointLocation", chk).start()
    """
    meta_path = os.path.join(index_path, "_bm25_index_meta.json")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not os.path.exists(meta_path):
            bm25_index(
                batch_df, index_path, id_col, text_col,
                term_buckets=term_buckets, k1=k1, b=b,
            )
        else:
            with open(meta_path) as fh:
                meta = json.load(fh)
            if meta.get("last_batch_id", -1) >= batch_id:
                return  # committed-batch replay after restart: exact skip
            bm25_index_update(
                batch_df.sparkSession, batch_df, index_path, id_col, text_col
            )
        with open(meta_path) as fh:
            meta = json.load(fh)
        meta["last_batch_id"] = batch_id
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_path)

    return handle
