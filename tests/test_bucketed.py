"""Bucketed tables: co-located joins with zero exchange, value parity."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from transmog_spark.sources.tables import write_bucketed


def _plan(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v1")
    )
    toks = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("v2")
    )
    write_bucketed(
        docs, "t_docs_b", buckets=8, bucket_cols=["doc_id"],
        sort_cols=["doc_id"], path=str(tmp_path / "docs"),
    )
    write_bucketed(
        toks, "t_toks_b", buckets=8, bucket_cols=["doc_id"],
        sort_cols=["doc_id"], path=str(tmp_path / "toks"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_docs_b")
        b = spark.table("t_toks_b")
        joined = a.join(b, "doc_id")
        plan = _plan(joined)
        # co-located: both sides read pre-bucketed files — no shuffle at all
        assert _exchanges(plan) == 0, plan
        assert "SortMergeJoin" in plan

        # the same join over plain parquet shuffles both sides
        docs.write.mode("overwrite").parquet(str(tmp_path / "docs_plain"))
        toks.write.mode("overwrite").parquet(str(tmp_path / "toks_plain"))
        plain = spark.read.parquet(str(tmp_path / "docs_plain")).join(
            spark.read.parquet(str(tmp_path / "toks_plain")), "doc_id"
        )
        assert _exchanges(_plan(plain)) >= 2

        # identical results
        got = {(r["doc_id"], r["v1"], r["v2"]) for r in joined.collect()}
        exp = {(r["doc_id"], r["v1"], r["v2"]) for r in plain.collect()}
        assert got == exp and len(got) == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_toks_b")


def test_bucketed_aggregation_skips_shuffle(spark, tmp_path):
    df = spark.range(4000).select(
        (F.col("id") % 97).alias("doc_id"), F.col("id").alias("n")
    )
    write_bucketed(
        df, "t_agg_b", buckets=8, bucket_cols=["doc_id"],
        path=str(tmp_path / "agg"),
    )
    try:
        agg = spark.table("t_agg_b").groupBy("doc_id").agg(F.sum("n").alias("s"))
        assert _exchanges(_plan(agg)) == 0
        exp = {
            (r["doc_id"], r["s"])
            for r in df.groupBy("doc_id").agg(F.sum("n").alias("s")).collect()
        }
        got = {(r["doc_id"], r["s"]) for r in agg.collect()}
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg_b")
