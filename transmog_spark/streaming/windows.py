"""Event-time streaming operators: watermarks + windowed/session aggregates.

The reference has no genuine streaming semantics (SURVEY.md §2.9) — its
"stream" is bounded-memory batching. These operators are the engine's
Structured-Streaming surface for real event streams:

* ``windowed_counts``     — tumbling event-time windows with a watermark
                            (late data beyond the watermark is dropped by
                            Spark's state store, not by us).
* ``session_aggregates_stream`` — native ``F.session_window`` gap sessions;
                            works identically over batch DataFrames (the
                            batch/stream parity is what makes it testable
                            here and deployable as ``readStream`` in prod).

Both run on batch OR streaming inputs unchanged — pass a ``readStream``
DataFrame and attach ``writeStream`` downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Attach an event-time watermark on streaming inputs; no-op on batch."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time windowed aggregates with late-data bound.

    Returns (window_start, window_end, *keys, n_events, *aggs).
    """
    src = with_watermark(df, ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_events")]
    for col, fn in (agg_cols or {}).items():
        aggs.append(getattr(F, fn if fn != "mean" else "avg")(col).alias(f"{col}_{fn}"))
    out = src.groupBy(win.alias("w"), *(keys or [])).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *[c for c in out.columns if c != "w" and c not in (keys or [])],
    )


def dedupe_stream(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup with BOUNDED state.

    On a stream: ``dropDuplicatesWithinWatermark`` — a duplicate arriving
    within the watermark horizon of the first copy is dropped, and key
    state older than the watermark is evicted (state size is O(keys per
    horizon), not O(all keys ever) — the property that lets this run
    forever on an at-least-once ingest feed). Two copies separated by more
    than the horizon both survive by design; exact global dedup over all
    history is the batch operator (``operators.dedup``).

    On a batch frame: plain ``dropDuplicates`` (global), so batch/stream
    parity tests can share one call site.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def session_aggregates_stream(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Gap-based session aggregates via the native session_window state op.

    Same session semantics as ``operators.windows.sessionize`` + aggregate
    (a new session starts after ``gap`` idle), but expressed as a streaming
    state operator: runs incrementally with bounded state on a stream, and
    identically on batch frames (asserted against the batch sessionizer in
    tests). Sessions end at last_event_ts + gap in the window metadata.
    """
    keys = [key] if isinstance(key, str) else list(key)
    src = with_watermark(df, ts_col, watermark)
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("session_len"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    for col, fn in (agg_cols or {}).items():
        aggs.append(getattr(F, fn if fn != "mean" else "avg")(col).alias(f"session_{col}_{fn}"))
    out = src.groupBy(F.session_window(ts_col, gap).alias("sw"), *keys).agg(*aggs)
    return out.select(
        *keys,
        F.col("sw.start").alias("window_start"),
        F.col("sw.end").alias("window_end"),
        *[c for c in out.columns if c not in {"sw", *keys}],
    )
