"""Windowed feature operators: lag/lead, ffill/bfill, gap sessionize, session aggs.

All pure ``pyspark.sql.Window`` compositions — one shuffle on the partition
key per window family, whole-stage codegen, no Python. These are the
north-rule operators the reference lacks entirely (SURVEY.md §2.8): the
reference stops at flattening; this engine turns the flattened
entity×timestamp spine into point-in-time features.

Scale notes: all windows here partition by a high-cardinality key
(``doc_id``/``user_id``), so skew is bounded by the hottest single entity.
Reuse one Window spec across features so Catalyst collapses them into a
single sort (check: one Exchange + one Sort in the plan, N projects).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def entity_window(key: str | list[str], ts: str | list[str]) -> WindowSpec:
    """Per-entity time order; pass [ts, tiebreak_col] for determinism on ties."""
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts] if isinstance(ts, str) else list(ts)
    return Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])


def with_lag_lead(
    df: DataFrame,
    key: str | list[str],
    ts: str | list[str],
    cols: list[str],
    *,
    offsets: tuple[int, ...] = (1,),
    prefix: str = "",
) -> DataFrame:
    """Add ``{col}_lag{k}`` / ``{col}_lead{k}`` per entity ordered by ts."""
    w = entity_window(key, ts)
    out = df
    for c in cols:
        for k in offsets:
            out = out.withColumn(f"{prefix}{c}_lag{k}", F.lag(c, k).over(w))
            out = out.withColumn(f"{prefix}{c}_lead{k}", F.lead(c, k).over(w))
    return out


def with_ffill(
    df: DataFrame,
    key: str | list[str],
    ts: str | list[str],
    cols: list[str],
    *,
    suffix: str = "_ffill",
) -> DataFrame:
    """Forward-fill nulls per entity: last non-null value at or before ts."""
    keys = [key] if isinstance(key, str) else list(key)
    w = entity_window(keys, ts).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def with_bfill(
    df: DataFrame,
    key: str | list[str],
    ts: str | list[str],
    cols: list[str],
    *,
    suffix: str = "_bfill",
) -> DataFrame:
    """Backward-fill nulls per entity: first non-null value at or after ts."""
    keys = [key] if isinstance(key, str) else list(key)
    w = entity_window(keys, ts).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.first(c, ignorenulls=True).over(w))
    return out


def with_rolling_agg(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    agg_cols: dict[str, list[str]],
    *,
    windows_seconds: dict[str, float],
    include_current: bool = True,
    prefix: str = "",
    prior_prefix: str | None = None,
) -> DataFrame:
    """Trailing time-window aggregates per entity — the classic
    point-in-time feature family ("events in the last hour", "token volume
    over the trailing 7 days").

    ``agg_cols`` maps column -> aggs in {sum, mean, min, max, count};
    ``windows_seconds`` maps a label -> trailing seconds, emitting
    ``{prefix}{col}_{fn}_{label}`` per combination. ``prior_prefix`` (if
    set) additionally emits a strictly-prior (zero-leakage) twin
    ``{prior_prefix}{col}_{fn}_{label}`` for every combination IN THE SAME
    PASS — ask for both variants here rather than in two calls.

    Frames are time-RANGE frames over **integer microseconds**
    (``unix_micros``), so the bounds are exact longs — bit-reproducible
    in the DuckDB oracle (``epoch_us`` + ``RANGE BETWEEN n PRECEDING``)
    and immune to float-time drift. The strictly-prior frame ends at
    ``1 PRECEDING``: a feature at time t sees neither the event carrying
    t itself nor any peer event at the same microsecond — the
    zero-temporal-leakage posture.

    Scale shape: the integer-microsecond order key is materialized ONCE as
    a real column, so every frame (all labels, inclusive AND strictly-
    prior) shares one attribute-identical (partition, order) — Catalyst
    plans a single Exchange + single Sort and stacks the frames in one
    Window family; adding a label or the prior twin costs no extra
    shuffle or sort (pinned by tests/test_plan_quality.py). Two separate
    calls instead re-derive the key as a fresh attribute per call and pay
    one redundant Sort each. Skew is bounded by the hottest single
    entity, same as every operator in this module. Float ``sum``/``mean``
    over a RANGE frame are evaluated in frame order by both Spark and
    DuckDB but remain float-associativity-sensitive across engines —
    scale to integer units first when the result feeds a cross-engine
    compare (see sessionize's ``stable_sum`` pattern).
    """
    if prior_prefix is not None and prior_prefix == prefix:
        raise ValueError("prior_prefix must differ from prefix (column names collide)")
    keys = [key] if isinstance(key, str) else list(key)
    us_col = "__rolling_us"
    out = df.withColumn(us_col, F.unix_micros(F.col(ts).cast("timestamp")))
    variants = [(prefix, Window.currentRow if include_current else -1)]
    if prior_prefix is not None:
        variants.append((prior_prefix, -1))
    new_cols = {}
    for label, secs in windows_seconds.items():
        lo = -int(secs * 1_000_000)
        for pfx, hi in variants:
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col(us_col).asc())
                .rangeBetween(lo, hi)
            )
            for c, fns in agg_cols.items():
                for fn in fns:
                    agg = getattr(F, fn if fn != "mean" else "avg")(c).over(w)
                    new_cols[f"{pfx}{c}_{fn}_{label}"] = agg
    return out.withColumns(new_cols).drop(us_col)


def sessionize(
    df: DataFrame,
    key: str | list[str],
    ts: str | list[str],
    *,
    gap_seconds: float,
    session_col: str = "session_id",
    index_col: str = "session_index",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the entity is idle
    longer than ``gap_seconds``.

    The gap compare runs on integer microseconds (``unix_micros``), not
    floats — exact, and reproducible bit-for-bit in the DuckDB oracle
    (``epoch_us``). ``session_index`` is the 0-based per-entity session
    ordinal (running sum of session-start flags — the classic single-sort
    formulation); ``session_id`` a deterministic global id (key + index).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts] if isinstance(ts, str) else list(ts)
    ts0 = order[0]
    w = entity_window(keys, order)
    gap_us = int(gap_seconds * 1_000_000)
    # cast covers TIMESTAMP_NTZ parquet columns (session tz is UTC)
    us = F.unix_micros(F.col(ts0).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = entity_window(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn(index_col, (F.sum(is_new).over(run) - F.lit(1)).cast("long"))
    sid = F.concat_ws("#", *[F.col(k).cast("string") for k in keys], F.col(index_col))
    return out.withColumn(session_col, sid)


def with_session_stats(
    df: DataFrame,
    key: str | list[str],
    *,
    index_col: str = "session_index",
    agg_cols: dict[str, list[str]] | None = None,
    len_col: str = "session_len",
    prefix: str = "sess_",
) -> DataFrame:
    """Per-session aggregates as *window* columns (no groupBy, no join-back).

    ``Window.partitionBy(keys + [index_col])`` is a ClusteredDistribution the
    frame's existing hash-partitioning on ``keys`` already satisfies — Spark
    adds only a Sort, never a new Exchange, so at scale this beats the
    groupBy + self-join formulation by one full shuffle of the wide frame.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys, index_col)
    out = df.withColumn(len_col, F.count(F.lit(1)).over(w))
    for c, fns in (agg_cols or {}).items():
        for fn in fns:
            agg = getattr(F, fn if fn != "mean" else "avg")(c).over(w)
            out = out.withColumn(f"{prefix}{c}_{fn}", agg)
    return out


def session_aggregates(
    sessions: DataFrame,
    key: str | list[str],
    ts: str,
    *,
    session_col: str = "session_id",
    agg_cols: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Per-session aggregates over a sessionized frame.

    ``agg_cols`` maps column -> list of aggs in {sum, mean, min, max}.
    Always emits session_start / session_end / session_len (row count) —
    the north rule's "session aggregates" feature family.
    """
    keys = [key] if isinstance(key, str) else list(key)
    aggs: list[Column] = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("session_len"),
    ]
    for c, fns in (agg_cols or {}).items():
        for fn in fns:
            aggs.append(getattr(F, fn if fn != "mean" else "avg")(c).alias(f"session_{c}_{fn}"))
    return sessions.groupBy(*keys, session_col).agg(*aggs)
