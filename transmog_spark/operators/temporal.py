"""Temporal operators beyond as-of: point-in-interval (range) join and
multi-resolution time rollups (hypertable-style continuous aggregates).

Scale shapes:

* ``interval_join`` — Spark evaluates a raw ``ts BETWEEN start AND end``
  join as an equi-join on the key with the range as a post-filter; with a
  hot key every point meets every interval of that key. The bucketed plan
  here explodes each interval into the fixed-width time buckets it
  overlaps and joins on (key, bucket): each point lives in exactly ONE
  bucket, so a (point, interval) pair can only meet once — no dedup pass —
  and the per-task work is bounded by bucket width, not key cardinality.
  Same idea as the bin-based range-join optimization in Databricks/Flink
  temporal joins.

* ``time_rollup`` — the 1-day aggregate is computed FROM the 1-hour
  aggregate, not from raw data (the continuous-aggregate cascade): raw is
  read once, each coarser resolution reads the (much smaller) finer one.

Sums are exposed in integer micro-units scaled back to doubles so the
DuckDB oracle compares stably (float summation is order-dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    return F.unix_micros(col.cast("timestamp"))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    *,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Attach every interval containing each point (inclusive bounds).

    One shuffle per side on (key, time-bucket); intervals replicate only
    into buckets they actually overlap (a narrow explode). Degenerate
    intervals (end < start) match nothing.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [
            c for c in intervals.columns if c not in set(keys) | {start_col, end_col}
        ]
    bucket_us = bucket_seconds * 1_000_000

    p = points.withColumn("__bkt", F.floor(_us(F.col(point_ts)) / bucket_us))
    iv = intervals.select(
        *keys,
        F.col(start_col).alias("__start"),
        F.col(end_col).alias("__end"),
        *payload_cols,
    ).where(F.col("__start") <= F.col("__end"))
    iv = iv.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(_us(F.col("__start")) / bucket_us),
                F.floor(_us(F.col("__end")) / bucket_us),
            )
        ),
    )
    joined = p.join(iv, [*keys, "__bkt"]).where(
        (F.col(point_ts) >= F.col("__start")) & (F.col(point_ts) <= F.col("__end"))
    )
    return joined.select(*points.columns, *payload_cols)


def stable_sum(col: str | Column, *, scale: int = 1_000_000) -> Column:
    """Order-independent double sum: per-row rounding to integer
    ``1/scale`` units, exact integer aggregation, scaled back. The idiom
    every oracle-compared sum in this engine uses."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")).cast("double") / float(scale)


def time_rollup(
    df: DataFrame,
    keys: str | list[str],
    *,
    ts: str = "ts",
    value: str = "value",
    resolutions: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Multi-resolution time aggregates in long format:
    (resolution, bucket_ts, keys..., n_events, value_sum).

    ``resolutions`` must be ordered fine -> coarse (each level aggregates
    the previous level's output, so raw data is scanned exactly once).
    value_sum is carried as exact integer micro-units between levels and
    only scaled back at the output boundary.
    """
    klist = [keys] if isinstance(keys, str) else list(keys)
    fine = resolutions[0]
    level = (
        df.groupBy(F.date_trunc(fine, F.col(ts)).alias("bucket_ts"), *klist)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value) * 1_000_000).cast("long")).alias("__sum_us"),
        )
    )
    out = level.select(
        F.lit(fine).alias("resolution"),
        "bucket_ts",
        *klist,
        "n_events",
        (F.col("__sum_us").cast("double") / 1e6).alias("value_sum"),
    )
    for res in resolutions[1:]:
        level = (
            level.groupBy(
                F.date_trunc(res, F.col("bucket_ts")).alias("bucket_ts"), *klist
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("__sum_us").alias("__sum_us"),
            )
        )
        out = out.unionByName(
            level.select(
                F.lit(res).alias("resolution"),
                "bucket_ts",
                *klist,
                "n_events",
                (F.col("__sum_us").cast("double") / 1e6).alias("value_sum"),
            )
        )
    return out


def scd2_intervals(
    df: DataFrame,
    keys: str | list[str],
    *,
    ts: str = "ts",
    tracked: list[str] | None = None,
    collapse: bool = True,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Build SCD type-2 validity intervals from a change-event log: one row
    per (entity, state) run with ``valid_from`` = the change timestamp and
    ``valid_to`` = the NEXT change's timestamp (NULL for the current row) —
    the slowly-changing-dimension table every point-in-time feature store
    keeps, and the natural left input to ``interval_join`` /
    ``asof_join`` for leakage-free lookups (a feature read at t joins the
    interval with valid_from <= t < valid_to).

    ``collapse=True`` (the SCD2 compaction rule) drops a change row whose
    ``tracked`` values are null-safe-equal to the entity's previous row,
    so repeated writes of the same state never fragment the interval.

    Scale shape: ONE Exchange on ``keys`` + ONE Sort — the collapse lag,
    the post-filter, and the closing lead all run over the same window
    spine (a filter preserves partitioning and ordering, so Catalyst
    plans the second Window without a new shuffle or sort). No joins, no
    driver actions; output rows <= input rows.

    Caller contract: (keys, ts) must be unique (pre-aggregate duplicate
    timestamps first) — with ties the "previous row" is undefined and the
    interval chain is non-deterministic.
    """
    klist = [keys] if isinstance(keys, str) else list(keys)
    if tracked is None:
        tracked = [c for c in df.columns if c not in set(klist) | {ts}]
    if not tracked:
        raise ValueError("scd2_intervals needs at least one tracked column")

    w = Window.partitionBy(*klist).orderBy(ts)
    out = df
    if collapse:
        changed = F.lit(False)
        for c in tracked:
            prev = F.lag(F.col(c)).over(w)
            changed = changed | ~prev.eqNullSafe(F.col(c))
        first = F.lag(F.col(ts)).over(w).isNull()
        out = out.withColumn("__tm_keep", first | changed).where(
            F.col("__tm_keep")
        ).drop("__tm_keep")
    return out.select(
        *klist,
        *tracked,
        F.col(ts).alias(valid_from),
        F.lead(F.col(ts)).over(w).alias(valid_to),
    )
