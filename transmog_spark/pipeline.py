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
from transmog_spark.operators.windows import sessionize, session_aggregates, with_lag_lead

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


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

    sess = session_aggregates(
        feats,
        "user_id",
        "ts",
        agg_cols={"value": ["sum", "mean"]},
    ).select(
        "user_id",
        "session_id",
        "session_len",
        F.col("session_value_sum").alias("sess_value_sum"),
    )
    return feats.join(sess, ["user_id", "session_id"], "left")
