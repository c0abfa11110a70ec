"""Flagship end-to-end pipeline: flatten -> as-of join -> sessionize -> features.

The composed north-rule workload over the driver-provided ``events`` table
(and, for the synthetic path, over generated tokenized sequences): this is
what ``__spark_entry__.entry`` smokes and what ``bench.py`` scales.

Pipeline (all built-in operators, one window-shuffle family on user_id):
  1. flatten the JSON ``props`` payload into typed columns (engine flatten,
     natural ids — no generated columns in the hot path)
  2. point-in-time join: every event sees the latest prior 'click' value of
     the same user (zero leakage by construction)
  3. gap-sessionize per user; per-session aggregates
  4. lag/lead features on the event value
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transmog_spark.config import EngineConfig
from transmog_spark.operators.asof import asof_join
from transmog_spark.operators.flatten import flatten
from transmog_spark.operators.windows import sessionize, with_lag_lead, with_session_stats

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])

# token_features prepared-plan memo — see the note inside token_features.
_TOKEN_FEATURES_PLANS: dict[tuple, DataFrame] = {}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def flatten_event_props(events: DataFrame) -> DataFrame:
    """Engine-flatten the JSON props column into ``props_k``."""
    nested = events.withColumn("props", F.from_json("props", PROPS_SCHEMA))
    cfg = EngineConfig(id_generation="natural", id_field="event_id", time_field=None)
    return flatten(nested, "events", cfg).main


def event_features(
    spark: SparkSession,
    sf_dir: str,
    *,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """The flagship feature frame: one row per event with PIT features."""
    events = flatten_event_props(load_events(spark, sf_dir))

    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    feats = asof_join(
        events.select("event_id", "user_id", "ts", "event_type", "value", "props_k"),
        clicks,
        on="user_id",
        value_cols=["click_value"],
        matched_ts_col="click_ts",
    )

    feats = sessionize(feats, "user_id", ["ts", "event_id"], gap_seconds=gap_seconds)
    feats = with_lag_lead(feats, "user_id", ["ts", "event_id"], ["value"])

    # session aggregates as window columns: reuses the user_id partitioning
    # the sessionize/lag windows already established (one Sort, zero new
    # Exchange) instead of a groupBy + self-join that re-shuffles the frame
    return with_session_stats(feats, "user_id", agg_cols={"value": ["sum"]})


def token_features(
    spark: SparkSession,
    n_docs: int,
    *,
    seed: str = "tmg",
    salt_buckets: int = 0,
    gap_seconds: float = 6 * 3600.0,
    partitions: int | None = None,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """North-rule flagship over the tokenized-sequence table (BASELINE.json).

    Input shape is exactly the ``input_hint``: (doc_id:string,
    tokens:array<int>, n_tok:int, source:string) plus nested revision
    metadata. Pipeline (every step a built-in DataFrame op — no per-row
    Python anywhere):

      1. engine-flatten the hierarchical ``sequence_meta`` (struct + array
         of revision structs) into normalized doc×revision-timestamp rows,
         lineage preserved via the natural ``doc_id`` parent key;
      2. sort-merge as-of join: each revision row sees the latest
         ``feature_v`` with ts <= revision ts (zero temporal leakage;
         optional salting for the skewed hot ``source``);
      3. gap-sessionize revisions per doc; lag/lead on revision ``n_tok``;
      4. re-attach the exact token arrays from ``sequences`` (token-array
         equality is asserted downstream per doc_id).

    Returns one row per (doc_id, revision ts) with tokens intact.
    """
    from transmog_spark.sources import synth

    # Prepared-plan memo (the __spark_entry__._prepared posture): the
    # composed flatten -> as-of -> windows tree costs ~0.9 s of identical
    # driver-side derivation per call. Plan object only — every execution
    # recomputes from the synthetic generators.
    memo_key = (
        spark.sparkContext.applicationId,
        n_docs, seed, salt_buckets, gap_seconds, partitions, hash_mode,
    )
    cached = _TOKEN_FEATURES_PLANS.get(memo_key)
    if cached is not None:
        return cached

    kw = {"seed": seed, "partitions": partitions, "hash_mode": hash_mode}
    seqs = synth.sequences(spark, n_docs, **kw)
    meta = synth.sequence_meta(spark, n_docs, **kw)
    # tie determinism (several feature events at one exact (doc_id, ts))
    # comes from asof_join's value-column sort tiebreak — equivalent to
    # max(feature_v) per instant, with NO pre-aggregation shuffle; the
    # DuckDB oracle mirrors it as a groupBy-max (token_pipeline_sql.feg)
    feats_src = synth.feature_events(spark, n_docs, **kw).select(
        "doc_id", "ts", "feature_v"
    )

    # synth guarantees non-null doc_id; skip the eager validation scan
    cfg = EngineConfig(
        id_generation="natural", id_field="doc_id", time_field=None, validate_natural=False
    )
    flat = flatten(meta, "sequences", cfg)
    revs = flat.tables["sequences_meta_revisions"].select(
        F.col("_parent_id").alias("doc_id"),
        F.col("rev"),
        F.col("editor"),
        F.col("ts"),
        F.col("n_tok").alias("rev_n_tok"),
    )

    pit = asof_join(
        revs,
        feats_src,
        on="doc_id",
        value_cols=["feature_v"],
        salt_buckets=salt_buckets,
        matched_ts_col="feature_ts",
    )
    pit = sessionize(pit, "doc_id", ["ts", "rev"], gap_seconds=gap_seconds)
    pit = with_lag_lead(pit, "doc_id", ["ts", "rev"], ["rev_n_tok"])

    out = pit.join(
        seqs.select("doc_id", "tokens", "n_tok", "source"), "doc_id", "inner"
    ).select(
        "doc_id",
        "source",
        "rev",
        "ts",
        "rev_n_tok",
        "feature_v",
        "feature_ts",
        "session_index",
        "rev_n_tok_lag1",
        "rev_n_tok_lead1",
        "tokens",
        "n_tok",
    )
    _TOKEN_FEATURES_PLANS[memo_key] = out
    return out
