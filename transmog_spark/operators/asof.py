"""Point-in-time (as-of) join — the north-rule centerpiece.

Spark has no native ``merge_asof``; this implements the sort-merge
union-sentinel composition (SURVEY.md §7.5) with *zero temporal leakage by
construction*: a query row can only ever see feature rows that sort before
it, and the sort places a feature at timestamp ``t`` before (inclusive) or
after (strict) a query at ``t``.

Physical shape: one shuffle on the (optionally salted) key, then a single
window sort per partition — i.e. exactly a distributed sort-merge join.
There is no build-side/probe-side asymmetry to blow memory on, no
broadcast requirement, and AQE can split skewed partitions because the
heavy lifting is a plain window aggregation.

Skew: joining on a low-cardinality, zipf-skewed key (``source``) hotspots a
partition. ``salt_buckets=K`` replicates the *feature* side K times and
hashes queries into one of the K sub-keys — every sub-partition sees every
feature but only 1/K of the queries. Feature replication is a narrow
``explode`` (no extra shuffle beyond the one we already pay).

A ``pandas.merge_asof``-backed ``applyInPandas`` variant is provided as a
cross-check oracle (per-key groups; not the scale path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_IS_Q = "__tm_is_q"
_SALT = "__tm_salt"


def _secs_fn(ts_type):
    """Seconds-as-double accessor for gap arithmetic, by timestamp type."""
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        # TIMESTAMP_NTZ has no direct double cast; go through unix_micros
        def secs(c: Column) -> Column:
            return F.unix_micros(c.cast("timestamp")).cast("double") / 1e6
    else:
        def secs(c: Column) -> Column:
            return c.cast("double")
    return secs


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] = "doc_id",
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: float | None = None,
    salt_buckets: int = 0,
    matched_ts_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right values with ts <= (or <) left ts.

    Returns the left columns plus ``value_cols`` (and optionally the matched
    right timestamp for leakage audits). Rows with no match keep NULLs
    (left-outer semantics, like ``pandas.merge_asof``).

    ``direction='forward'`` flips the temporal predicate: attach the
    EARLIEST right values with ts >= (or >, when strict) left ts — the
    label join ("first outcome at/after the feature timestamp"). Feature
    engineering stays backward (zero leakage, the north-rule contract);
    forward is for building the label table, where looking forward is the
    point. Same union-sort-window plan, same salting, same tolerance
    (bounded to at most ``tolerance_seconds`` AFTER the left ts);
    mirrored in DuckDB as ``ASOF LEFT JOIN ... ON l.ts <= r.ts``.

    ``direction='nearest'`` attaches whichever side is closer in time
    (sensor alignment, "the reading nearest this event"); exact-ts
    matches resolve backward, a backward/forward distance tie resolves
    backward (the pandas ``merge_asof`` convention), and tolerance
    bounds each side's own gap before the side is chosen. Inclusive
    only; still one shuffle (two window passes share the sort spine).
    NOT for feature engineering — nearest looks forward by design.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest" and strict:
        raise ValueError(
            "direction='nearest' supports inclusive matches only "
            "(strict=True would need equal-ts exclusion on both sides)"
        )
    fwd = direction == "forward"
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]

    lcols = [c for c in left.columns]
    _ts = "__tm_ts"
    _mts = matched_ts_col or "__tm_matched_ts"

    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias(_ts),
        F.lit(1).alias(_IS_Q),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tm_v_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(_mts),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        F.col(right_ts).alias(_ts),
        F.lit(0).alias(_IS_Q),
        *[F.col(c).alias(f"__tm_v_{c}") for c in value_cols],
        F.col(right_ts).alias(_mts),
    )

    part_keys: list[Column] = [F.col(k) for k in keys]
    if salt_buckets > 1:
        # Queries land in one sub-key; features are replicated into all K.
        l = l.withColumn(
            _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in lcols], F.col(_ts)), F.lit(salt_buckets))
        )
        r = r.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
        )
        part_keys.append(F.col(_SALT))

    u = l.unionByName(r)

    if direction == "nearest":
        # One shuffle, two in-partition window passes over the SAME
        # ascending-ts sort spine: backward = last feature at/before,
        # forward = first feature after. Equal-ts features sort before
        # queries, so they land on the backward side with gap 0 — which
        # then beats any forward candidate, i.e. exact matches resolve
        # backward (pandas merge_asof 'nearest' convention). Feature-ts
        # ties resolve to max(value_cols) on both sides (the forward
        # window orders value columns DESC so first() = max, matching
        # backward's last() over ASC). Tolerance bounds each side's own
        # gap before the side is chosen.
        order_b = [F.col(_ts).asc(), F.col(_IS_Q).asc()]
        order_b += [F.col(f"__tm_v_{c}").asc() for c in value_cols]
        order_f = [F.col(_ts).asc(), F.col(_IS_Q).asc()]
        order_f += [F.col(f"__tm_v_{c}").desc() for c in value_cols]
        wb = (
            Window.partitionBy(*part_keys)
            .orderBy(*order_b)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*part_keys)
            .orderBy(*order_f)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )

        def feat(c: Column) -> Column:
            return F.when(F.col(_IS_Q) == 0, c)

        filled = u
        for c in value_cols:
            v = F.col(f"__tm_v_{c}")
            filled = filled.withColumn(
                f"__tm_b_{c}", F.last(feat(v), ignorenulls=True).over(wb)
            ).withColumn(
                f"__tm_f_{c}", F.first(feat(v), ignorenulls=True).over(wf)
            )
        filled = filled.withColumn(
            "__tm_bts", F.last(feat(F.col(_mts)), ignorenulls=True).over(wb)
        ).withColumn(
            "__tm_fts", F.first(feat(F.col(_mts)), ignorenulls=True).over(wf)
        )

        out = filled.where(F.col(_IS_Q) == 1)
        secs = _secs_fn(right.schema[right_ts].dataType)
        gap_b = secs(F.col(_ts)) - secs(F.col("__tm_bts"))
        gap_f = secs(F.col("__tm_fts")) - secs(F.col(_ts))
        valid_b = F.col("__tm_bts").isNotNull()
        valid_f = F.col("__tm_fts").isNotNull()
        if tolerance_seconds is not None:
            valid_b = valid_b & (gap_b <= F.lit(tolerance_seconds))
            valid_f = valid_f & (gap_f <= F.lit(tolerance_seconds))
        use_b = valid_b & (~valid_f | (gap_b <= gap_f))

        select = [F.col(c) for c in lcols]
        select += [
            F.when(use_b, F.col(f"__tm_b_{c}"))
            .when(valid_f, F.col(f"__tm_f_{c}"))
            .alias(c)
            for c in value_cols
        ]
        if matched_ts_col:
            select.append(
                F.when(use_b, F.col("__tm_bts"))
                .when(valid_f, F.col("__tm_fts"))
                .alias(matched_ts_col)
            )
        return out.select(*select)

    # Ordering encodes the temporal predicate: the window walks time in the
    # match direction (ascending ts for backward, descending for forward),
    # so "last feature seen" is the closest match. Inclusive sorts features
    # before queries at equal ts; strict sorts them after. Value columns
    # extend the sort key so ties among feature rows at the SAME timestamp
    # resolve deterministically (last = lexicographic max of value_cols) —
    # this widens the existing sort key instead of costing a pre-aggregation
    # shuffle, and matches max() tie resolution for a single value column.
    ts_order = F.col(_ts).desc() if fwd else F.col(_ts).asc()
    order = [ts_order, F.col(_IS_Q).asc() if not strict else F.col(_IS_Q).desc()]
    order += [F.col(f"__tm_v_{c}").asc() for c in value_cols]
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = u
    for c in value_cols:
        filled = filled.withColumn(
            f"__tm_v_{c}",
            F.last(F.when(F.col(_IS_Q) == 0, F.col(f"__tm_v_{c}")), ignorenulls=True).over(w),
        )
    filled = filled.withColumn(
        _mts, F.last(F.when(F.col(_IS_Q) == 0, F.col(_mts)), ignorenulls=True).over(w)
    )

    out = filled.where(F.col(_IS_Q) == 1)
    if tolerance_seconds is not None:
        secs = _secs_fn(right.schema[right_ts].dataType)
        gap = secs(F.col(_ts)) - secs(F.col(_mts))
        in_tol = (-gap if fwd else gap) <= F.lit(tolerance_seconds)
        for c in value_cols:
            out = out.withColumn(f"__tm_v_{c}", F.when(in_tol, F.col(f"__tm_v_{c}")))
        out = out.withColumn(_mts, F.when(in_tol, F.col(_mts)))

    select = [F.col(c) for c in lcols]
    select += [F.col(f"__tm_v_{c}").alias(c) for c in value_cols]
    if matched_ts_col:
        select.append(F.col(_mts).alias(matched_ts_col))
    return out.select(*select)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "doc_id",
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Cross-check oracle: per-key ``pandas.merge_asof`` via applyInPandas.

    Arrow-batched (no per-row Python at the API level); used in tests to
    verify the union-sentinel plan, not as the scale path (a giant key group
    must fit in one executor's memory).
    """
    import pandas as pd

    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {on, right_ts}]
    l_schema = left.schema
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in l_schema.fields]
    out_fields += [
        f"{c} {right.schema[c].dataType.simpleString()}" for c in value_cols
    ]
    schema = ", ".join(out_fields)
    lcols = list(left.columns)

    right_sel = right.select(on, right_ts, *value_cols)
    tagged = left.select(*lcols).withColumn("__side", F.lit(1)).unionByName(
        right_sel.withColumn("__side", F.lit(0)), allowMissingColumns=True
    )

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["__side"] == 1][lcols].sort_values(left_ts, kind="mergesort")
        rp = pdf[pdf["__side"] == 0][[on, right_ts, *value_cols]].sort_values(
            right_ts, kind="mergesort"
        )
        if rp.empty:
            res = lp.copy()
            for c in value_cols:
                res[c] = None
            return res
        res = pd.merge_asof(
            lp,
            rp.rename(columns={right_ts: "__rts"}),
            left_on=left_ts,
            right_on="__rts",
            by=on,
            allow_exact_matches=not strict,
        )
        return res[lcols + value_cols]

    return tagged.groupBy(on).applyInPandas(merge, schema=schema)


def leakage_violations(
    joined: DataFrame, ts_col: str, matched_ts_col: str, *, strict: bool = False
) -> int:
    """Count rows whose matched feature timestamp leaks future data (must be 0)."""
    cmp = F.col(matched_ts_col) >= F.col(ts_col) if strict else F.col(matched_ts_col) > F.col(ts_col)
    return joined.where(F.col(matched_ts_col).isNotNull() & cmp).count()


def asof_join_multi(
    left: DataFrame,
    rights: "list[tuple[str, DataFrame]]",
    on: str | list[str] = "doc_id",
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    strict: bool = False,
    tolerance_seconds: float | None = None,
    salt_buckets: int = 0,
    matched_ts: bool = False,
) -> DataFrame:
    """Point-in-time join against SEVERAL feature tables — the feature-store
    lookup shape: for each left row, the latest row of EACH named feature
    table with ts <= (or <) the left ts, independently per table.

    ``rights`` is ``[(name, frame), ...]``; each frame's non-key, non-ts
    columns join the output prefixed ``{name}_`` (so homonymous feature
    columns from different tables never collide), plus ``{name}_matched_ts``
    when ``matched_ts`` is set — feed those to ``asof_audit`` for the
    per-table zero-leakage proof.

    Physical shape: a left fold of ``asof_join`` — table k adds one union +
    one window sort partitioned on the same keys. The shuffles don't fuse
    across tables (each union resets the partitioning), so cost is K
    sort-merge passes — the same work K independent as-of joins would do,
    with no cross-table state. At 100 TB prefer fewer, wider feature
    tables; per-table ``salt_buckets`` replication applies to every table
    (skewed sources stay balanced in each pass).
    """
    keys = {on} if isinstance(on, str) else set(on)
    out = left
    for name, right in rights:
        vcols = [c for c in right.columns if c not in keys | {right_ts}]
        renamed = right.select(
            *[F.col(k) for k in sorted(keys)],
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(f"{name}_{c}") for c in vcols],
        )
        out = asof_join(
            out,
            renamed,
            on,
            left_ts=left_ts,
            right_ts="__rts",
            value_cols=[f"{name}_{c}" for c in vcols],
            strict=strict,
            tolerance_seconds=tolerance_seconds,
            salt_buckets=salt_buckets,
            matched_ts_col=f"{name}_matched_ts" if matched_ts else None,
        )
    return out


def asof_audit(
    joined: DataFrame,
    keys: str | list[str],
    ts_col: str,
    matched_ts_col: str,
    *,
    strict: bool = False,
) -> DataFrame:
    """Distributed zero-temporal-leakage audit of an as-of join result:
    per key, (n_rows, n_matched, n_violations, max_lag_seconds). A
    violation is a matched feature timestamp in the query row's future —
    ``asof_join`` produces none BY CONSTRUCTION (the sort order encodes the
    predicate), and this audit turns that guarantee into a queryable,
    oracle-checkable frame instead of an assertion (north rule: "zero
    temporal leakage ... per-partition lineage + metrics").

    One map-side-combined aggregation; no joins, no windows. The lag is
    reported in exact integer MICROSECONDS (``max_lag_us``) — a
    seconds-as-double column would need a cross-engine float round, and
    round-to-4 flips on values like x.10295 (Spark rounds the shortest
    decimal repr, DuckDB the binary product); integers never disagree.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    viol = (
        F.col(matched_ts_col) >= F.col(ts_col)
        if strict
        else F.col(matched_ts_col) > F.col(ts_col)
    )
    lag_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        F.col(matched_ts_col).cast("timestamp")
    )
    return joined.groupBy(*key_list).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(matched_ts_col)).alias("n_matched"),
        F.sum(
            F.when(F.col(matched_ts_col).isNotNull() & viol, 1).otherwise(0)
        ).alias("n_violations"),
        F.max(F.when(F.col(matched_ts_col).isNotNull(), lag_us)).alias(
            "max_lag_us"
        ),
    )
