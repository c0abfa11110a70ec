"""Streaming maintenance of the incremental ANN (IVF) index.

``ann_index_foreach_batch`` keeps a v1 ``ann_index`` fresh from an
embedding stream: the first micro-batch builds the index (training and
FREEZING the centroids — FAISS's train-then-add contract; the first
batch is the training sample), every later one folds in via
``ann_index_update`` (cost ∝ batch, never corpus — a vector's cell is a
pure function of the vector and the frozen centroids, so increments are
bit-identical to rebuilds against those centroids).

Idempotency: identical posture to ``streaming/bm25.py`` — the handler
records the last applied ``batch_id`` in the index meta and SKIPS
replayed batches (foreachBatch is at-least-once; re-applying would store
the batch's vectors twice). A crash INSIDE an update (after the vectors
append, before the meta flip) still re-applies on retry — the same
non-transactional-sink window every foreachBatch writer has, documented
rather than hidden. Contract: the stream must deliver NEW vec_ids
(append-only corpus).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame

from transmog_spark.operators.ann_index import (
    META_NAME,
    _read_meta,
    _write_meta,
    ann_index,
    ann_index_update,
)


def ann_index_foreach_batch(
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    nlist: int = 16,
    refine_iterations: int = 0,
    dim: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` handler. Attach with::

        stream.writeStream.foreachBatch(
            ann_index_foreach_batch("/warehouse/ann")
        ).option("checkpointLocation", chk).start()
    """
    meta_path = os.path.join(index_path, META_NAME)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not os.path.exists(meta_path):
            ann_index(
                batch_df, index_path, id_col, vec_col,
                nlist=nlist, refine_iterations=refine_iterations, dim=dim,
            )
        else:
            meta = _read_meta(index_path)
            if meta.get("last_batch_id", -1) >= batch_id:
                return  # committed-batch replay after restart: exact skip
            ann_index_update(
                batch_df.sparkSession, batch_df, index_path, id_col, vec_col
            )
        meta = _read_meta(index_path)
        meta["last_batch_id"] = batch_id
        _write_meta(index_path, meta)

    return handle
