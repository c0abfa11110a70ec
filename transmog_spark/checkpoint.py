"""Per-partition watermark checkpoints + lineage metrics (north rule §7.8).

A backfill over 10^12 sequences cannot be one atomic job; this module makes
it resumable: after each partition range (e.g. a ``source`` × day slice)
completes, a watermark row is appended atomically (parquet append of a
single-row DataFrame). On resume, the input is filtered to ``ts >
watermark`` per partition key — idempotent when ids are deterministic
(hash/xxhash64 strategies), since re-emitted rows dedupe on ``_id``.

Lineage metrics mirror the reference's logging counters
(/root/reference/src/transmog/streaming.py:88-94) as a queryable table
instead of log lines.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WATERMARK_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("max_ts_processed", T.TimestampType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("child_rows", T.LongType(), True),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)


class CheckpointStore:
    """Watermark bookkeeping over a parquet (or Iceberg) side table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(WATERMARK_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], WATERMARK_SCHEMA)

    def watermarks(self) -> DataFrame:
        """Latest watermark per partition key."""
        df = self.read()
        return df.groupBy("partition_key").agg(
            F.max("max_ts_processed").alias("watermark")
        )

    def commit(
        self,
        partition_key: str,
        max_ts_processed,
        *,
        rows_in: int,
        rows_out: int,
        child_rows: int = 0,
        run_id: str,
        started_at: float | None = None,
    ) -> None:
        wall_ms = int((time.monotonic() - started_at) * 1000) if started_at else None
        row = [
            (
                partition_key,
                max_ts_processed,
                rows_in,
                rows_out,
                child_rows,
                run_id,
                wall_ms,
            )
        ]
        self.spark.createDataFrame(row, WATERMARK_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def committed_keys(self) -> set[str]:
        """Partition keys with a committed watermark (commit happens only
        after a slice's write completed, so presence == fully done)."""
        return {r[0] for r in self.watermarks().select("partition_key").collect()}

    def filter_resumable(
        self, df: DataFrame, partition_col: str, ts_col: str
    ) -> DataFrame:
        """Drop rows at or below each partition's committed watermark.

        Broadcast the (tiny) watermark table; null watermark = never
        processed = keep everything.

        NOTE: for one-shot backfills over partition-overwrite sinks, use
        ``committed_keys`` to skip whole slices instead — ts-filtering a
        committed partition and then overwriting it would drop the already
        -written rows if the input grew after the commit.
        """
        wm = self.watermarks().withColumnRenamed("partition_key", partition_col)
        joined = df.join(F.broadcast(wm), on=partition_col, how="left")
        return joined.where(
            F.col("watermark").isNull() | (F.col(ts_col) > F.col("watermark"))
        ).drop("watermark")
