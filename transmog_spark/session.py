"""SparkSession factory tuned for the engine.

One place to own the scale-relevant configuration: AQE (runtime re-plan +
skew-join splitting), Arrow for every Python<->JVM crossing, shuffle
partition sizing, and UTC session time. On a real cluster the same builder
is used by the ``jobs/`` spark-submit wrappers; locally tests pass
``master='local[N]'``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "transmog_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Scale posture (100 TB / 1000-executor design intent):
      * AQE on: runtime coalescing of small shuffle partitions and automatic
        skew-join splitting, so a hot ``source`` key cannot stall a stage.
      * Arrow on: all pandas UDF traffic is columnar batches, never pickled rows.
      * shuffle partitions default to cores locally; on a cluster the job
        wrapper sets it to ~2-3x total cores (or leaves AQE to coalesce).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N; match parallelism, don't default to 200
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = (os.cpu_count() or 8) if inner == "*" else int(inner)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # count/min/max answered from parquet footers where possible
        # (backfill lineage stats read the written slice this way)
        .config("spark.sql.parquet.aggregatePushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
