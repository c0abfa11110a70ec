"""Vectorized token-sequence features (north rule §B5).

Everything is a higher-order-function expression over ``array<int>`` —
JVM-side, no Python. The feature families the north rule names:

* n_tok stats (per doc and per source)
* lagged token windows (``tok_head8`` of the previous sequence per entity)
* session aggregates (composed from operators.windows)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transmog_spark.operators.windows import entity_window


def token_stats_cols(tokens: str = "tokens") -> dict[str, Column]:
    """Per-row token statistics as reusable Column expressions."""
    t = F.col(tokens)
    n = F.size(t)
    return {
        "n_tok": n,
        "tok_min": F.array_min(t),
        "tok_max": F.array_max(t),
        "tok_sum": F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + x),
        "tok_mean": (
            F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + x).cast("double")
            / F.when(n > 0, n).otherwise(F.lit(None))
        ),
        "tok_distinct": F.size(F.array_distinct(t)),
        "tok_head8": F.slice(t, 1, 8),
    }


def with_token_stats(df: DataFrame, tokens: str = "tokens") -> DataFrame:
    out = df
    for name, col in token_stats_cols(tokens).items():
        out = out.withColumn(name, col)
    return out


def with_lagged_token_window(
    df: DataFrame,
    key: str = "doc_id",
    ts: str = "ts",
    tokens: str = "tokens",
    *,
    head: int = 8,
    out_col: str = "prev_tok_head",
) -> DataFrame:
    """Previous sequence's first ``head`` tokens per entity (lagged token window)."""
    w = entity_window(key, ts)
    return df.withColumn(out_col, F.slice(F.lag(tokens).over(w), 1, head))


def source_stats(df: DataFrame, source: str = "source", n_tok: str = "n_tok") -> DataFrame:
    """Per-source sequence statistics (partial aggregation map-side; one shuffle)."""
    return df.groupBy(source).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.avg(n_tok).alias("avg_n_tok"),
        F.min(n_tok).alias("min_n_tok"),
        F.max(n_tok).alias("max_n_tok"),
    )
