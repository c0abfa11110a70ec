"""Streaming maintenance of the bounded-state sketches (CMS + HLL + HDR).

All three sketches are MERGEABLE — the algebraic property that makes them
the right streaming state: two CMS grids over disjoint streams sum
cell-wise into the grid of the union, two HLL register tables max-merge
into the registers of the union (Cormode & Muthukrishnan 2005 §4.1;
Flajolet et al. 2007 — register max commutes with stream union), and two
HDR bucket tables sum count-wise into the histogram of the union. So the
handler folds each micro-batch's sketch into a tiny persisted store
(≤ depth × width + 2^p + ~64k rows) with NO raw-data state, and any
point-in-time read answers "hot tokens so far" / "distinct tokens so
far" / "token-count quantiles so far" over the whole history of the
stream.

Store layout: generation dirs (``cms-g{N}``, ``hll-g{N}``, ``hdr-g{N}``)
with a
``_sketch_meta.json`` pointer — the merged sketch is written to the NEXT
generation and the meta flip is the commit point (a reader never sees a
half-written grid; parquet can't overwrite a path it is reading from).
Replay guard: ``last_batch_id`` in the meta, same at-least-once posture
as ``streaming/bm25.py`` — a committed-batch replay after restart is an
exact no-op, which matters doubly here because CMS addition is not
idempotent (a re-applied batch would overcount exactly as a duplicated
input would).

Parity pinned by test: streamed store == batch-built sketch on the union
input, cell-for-cell and register-for-register.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transmog_spark.operators.sketch import cms_sketch, hdr_histogram, hll_registers
from transmog_spark.operators.text import ws_tokens

_META = "_sketch_meta.json"


def _read_meta(store_path: str) -> dict | None:
    path = os.path.join(store_path, _META)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _write_meta(store_path: str, meta: dict) -> None:
    path = os.path.join(store_path, _META)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, path)


def read_cms(spark: SparkSession, store_path: str) -> DataFrame:
    """Current merged CMS grid (d, bucket, cnt)."""
    meta = _read_meta(store_path)
    if meta is None:
        raise FileNotFoundError(f"no sketch store at {store_path}")
    return spark.read.parquet(os.path.join(store_path, f"cms-g{meta['gen']}"))


def read_hll(spark: SparkSession, store_path: str) -> DataFrame:
    """Current merged HLL register table (bucket, reg)."""
    meta = _read_meta(store_path)
    if meta is None:
        raise FileNotFoundError(f"no sketch store at {store_path}")
    return spark.read.parquet(os.path.join(store_path, f"hll-g{meta['gen']}"))


def read_hdr(spark: SparkSession, store_path: str) -> DataFrame:
    """Current merged HDR token-count histogram (bucket, cnt) — feed to
    ``operators.sketch.hdr_quantiles`` with the store's ``hdr_k`` (in
    ``_sketch_meta.json``; decoding with a different k is silently wrong).

    For a store created BEFORE HDR maintenance shipped, the histogram
    covers only batches folded in since the upgrade (the pre-upgrade raw
    stream is gone — unlike CMS/HLL, there is no state to backfill from);
    reading such a store before its first post-upgrade batch raises."""
    meta = _read_meta(store_path)
    if meta is None:
        raise FileNotFoundError(f"no sketch store at {store_path}")
    path = os.path.join(store_path, f"hdr-g{meta['gen']}")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"store at {store_path} predates HDR maintenance and has not "
            "folded a batch since upgrading - no HDR generation exists yet"
        )
    return spark.read.parquet(path)


def sketch_foreach_batch(
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 256,
    p: int = 12,
    hdr_k: int = 32,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` handler. Attach with::

        stream.writeStream.foreachBatch(
            sketch_foreach_batch("/warehouse/sketches")
        ).option("checkpointLocation", chk).start()
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        meta = _read_meta(store_path)
        if meta is not None and meta.get("last_batch_id", -1) >= batch_id:
            return  # committed-batch replay: exact no-op (CMS + is not idempotent)
        new_cms = cms_sketch(batch_df, id_col, text_col, depth=depth, width=width)
        new_hll = hll_registers(batch_df, id_col, text_col, p=p)
        new_hdr = hdr_histogram(
            batch_df.select(
                F.size(ws_tokens(F.col(text_col))).cast("long").alias("__ntok")
            ),
            "__ntok",
            k=hdr_k,
        )
        if meta is None:
            gen = 1
        else:
            gen = meta["gen"] + 1
            old_cms = spark.read.parquet(
                os.path.join(store_path, f"cms-g{meta['gen']}")
            )
            old_hll = spark.read.parquet(
                os.path.join(store_path, f"hll-g{meta['gen']}")
            )
            # cell-wise sum / register-wise max / bucket-wise sum over keys
            new_cms = (
                old_cms.unionByName(new_cms)
                .groupBy("d", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
            new_hll = (
                old_hll.unionByName(new_hll)
                .groupBy("bucket")
                .agg(F.max("reg").alias("reg"))
            )
            old_hdr_path = os.path.join(store_path, f"hdr-g{meta['gen']}")
            if os.path.exists(old_hdr_path):  # stores created pre-HDR merge in
                old_hdr = spark.read.parquet(old_hdr_path)
                new_hdr = (
                    old_hdr.unionByName(new_hdr)
                    .groupBy("bucket")
                    .agg(F.sum("cnt").alias("cnt"))
                )
        # a crash between these writes and the meta flip leaves gen dirs no
        # meta references; the RETRY of that batch recomputes the same gen —
        # clear the orphans first (they are uncommitted by definition: meta
        # still points below gen) so the retry succeeds instead of erroring
        for prefix in ("cms-g", "hll-g", "hdr-g"):
            shutil.rmtree(
                os.path.join(store_path, f"{prefix}{gen}"), ignore_errors=True
            )
        new_cms.write.mode("error").parquet(
            os.path.join(store_path, f"cms-g{gen}")
        )
        new_hll.write.mode("error").parquet(
            os.path.join(store_path, f"hll-g{gen}")
        )
        new_hdr.write.mode("error").parquet(
            os.path.join(store_path, f"hdr-g{gen}")
        )
        _write_meta(
            store_path,
            {
                "gen": gen,
                "last_batch_id": batch_id,
                "depth": depth,
                "width": width,
                "p": p,
                "hdr_k": hdr_k,
            },
        )
        # GC superseded generations (meta already points past them) by
        # globbing what actually exists — one readdir over a dir the GC
        # itself keeps small, instead of a 1..gen rmtree loop whose no-op
        # syscall count grows linearly per batch over a long stream's
        # life (and, unlike a fixed trailing window, this can't leak a
        # generation under repeated crash-after-flip windows).
        import glob as _glob

        for d in _glob.glob(os.path.join(store_path, "*-g*")):
            name = os.path.basename(d)
            prefix, _, g_str = name.rpartition("-g")
            if prefix in ("cms", "hll", "hdr") and g_str.isdigit() and int(g_str) < gen:
                shutil.rmtree(d, ignore_errors=True)

    return handle
