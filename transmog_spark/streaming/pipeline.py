"""Streaming pipeline drivers.

The reference's ``flatten_stream`` (api.py:284-382, streaming.py:16-117) is
bounded-memory *batch* processing — Spark gives that for free (partitioned
execution, spill-to-disk), so ``flatten_stream`` here is flatten + write.

For genuine event streams, ``flatten_readstream`` wires the same plan into
Structured Streaming via ``foreachBatch``: each micro-batch is flattened
with one shared ``run_ts`` per batch and appended per table — the
first-batch-schema-freeze of the reference's writers (arrow_base.py:364-371)
becomes Spark's native fixed streaming schema.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from transmog_spark.config import EngineConfig
from transmog_spark.operators.flatten import FlattenResult, current_run_timestamp, flatten
from transmog_spark.sinks import sanitize_filename, write_table


def flatten_stream(
    df: DataFrame,
    output_path: str,
    entity_name: str = "entity",
    output_format: str = "parquet",
    config: EngineConfig | None = None,
    progress_callback: Callable[[int, int | None], None] | None = None,
    **options,
) -> list[str]:
    """Flatten and write straight to disk (reference P2 semantics).

    One ``extract_time`` for the whole run (api.py:238-239). The progress
    callback fires once per table with (rows_written, total) — Spark's unit
    of progress is the table/stage, not the 100-row batch of the reference.
    """
    cfg = config or EngineConfig()
    result = flatten(df, entity_name, cfg, run_ts=current_run_timestamp())
    written: list[str] = []
    tables = result.all_tables
    for name, table in tables.items():
        target = os.path.join(output_path, sanitize_filename(name))
        written.append(write_table(table, target, output_format, **options))
        if progress_callback is not None:
            progress_callback(len(written), len(tables))
    return written


def flatten_foreach_batch(
    entity_name: str,
    output_path: str,
    config: EngineConfig | None = None,
    output_format: str = "parquet",
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function for ``writeStream``.

    Usage::

        q = (stream_df.writeStream
             .foreachBatch(flatten_foreach_batch("events", "/out"))
             .option("checkpointLocation", "/chk").start())
    """
    cfg = config or EngineConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        result: FlattenResult = flatten(batch_df, entity_name, cfg)
        for name, table in result.all_tables.items():
            target = os.path.join(output_path, sanitize_filename(name))
            write_table(table, target, output_format, mode="append")

    return handle
