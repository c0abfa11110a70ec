"""Stream-static point-in-time enrichment: the as-of join over a stream.

The north-rule serving shape: a stream of sequence events is enriched with
the latest feature values at-or-before each event's timestamp from a
FEATURE table that lives outside the stream (a snapshot-versioned store,
``sources.snapshots``, or any parquet/Iceberg table). Inside
``foreachBatch`` each micro-batch is a bounded static frame, so the
already-oracle-gated batch ``operators.asof.asof_join`` runs verbatim —
identical temporal semantics (inclusive/strict/tolerance, zero leakage)
to the batch backfill, which is exactly the batch≡stream parity a feature
platform must guarantee (training features come from the batch job,
serving features from this stream; any divergence is a training/serving
skew bug).

Why stream-STATIC and not stream-stream: Spark's stream-stream joins need
a watermark bound on BOTH sides to GC state, but an as-of feature lookup
has no such bound — an event may legitimately match a feature row
arbitrarily far in its past, so the feature side's state is the whole
history. Bounded-state decomposition: the feature table is maintained by
its own pipeline (snapshots / SCD2 intervals via
``temporal.scd2_intervals``), and the stream joins against a point-in-time
READ of it per micro-batch. Pass ``features`` as a zero-arg callable to
re-resolve that read every batch (the snapshot-refresh shape — e.g.
``lambda: snapshot_read(spark, root)``); pass a plain (persisted)
DataFrame when one frozen feature version per run is intended.

Scale shape: per micro-batch it is the batch as-of plan — union-sentinel
sort-merge, 2 exchanges + 1 sort, salted via ``salt_buckets`` for hot
keys; the feature frame re-shuffles per batch unless persisted, so
persist the DataFrame form for high-frequency triggers.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

FeatureSource = DataFrame | Callable[[], DataFrame]


def enrich_batch(
    batch_df: DataFrame,
    features: FeatureSource,
    on: str | list[str] = "doc_id",
    **asof_kwargs,
) -> DataFrame:
    """One bounded batch through the point-in-time enrichment: the batch
    ``asof_join`` of the micro-batch against the (resolved) feature frame.
    All ``asof_join`` knobs pass through (left_ts/right_ts, value_cols,
    strict, tolerance_seconds, salt_buckets, matched_ts_col, direction)."""
    from transmog_spark.operators.asof import asof_join

    feats = features() if callable(features) else features
    return asof_join(batch_df, feats, on, **asof_kwargs)


def enrich_foreach_batch(
    sink: Callable[[DataFrame, int], None],
    *,
    features: FeatureSource,
    on: str | list[str] = "doc_id",
    **asof_kwargs,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` handler: as-of-enrich each micro-batch
    against the feature source and hand the result to ``sink``. Attach::

        stream.writeStream.foreachBatch(
            enrich_foreach_batch(sink, features=feature_df, on="doc_id")
        ).option("checkpointLocation", chk).trigger(availableNow=True).start()

    ``features`` may be a callable re-resolved per batch (snapshot
    refresh) or a static DataFrame (frozen feature version; persist it —
    every batch joins against it)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink(enrich_batch(batch_df, features, on, **asof_kwargs), batch_id)

    return handle
