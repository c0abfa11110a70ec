"""applyInPandasWithState: per-key running totals across micro-batches.

The state store must carry totals across SEPARATE streaming runs sharing a
checkpoint — the property that makes the operator a real incremental
aggregator rather than a per-batch groupBy.
"""

from __future__ import annotations

import pytest

from transmog_spark.streaming.stateful import running_totals

SCHEMA = "k string, v double"


def _run(spark, src, chk, sink_rows):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = running_totals(stream, "k", "v")

    def capture(batch_df, batch_id):
        sink_rows.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "chk")


def test_state_survives_across_streaming_runs(spark, dirs):
    src, chk = dirs
    spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)

    first: list = []
    _run(spark, src, chk, first)
    got1 = {r.k: (r.n_events, r.value_sum) for r in first}
    assert got1 == {"a": (2, 3.0), "b": (1, 5.0)}

    # second run, same checkpoint, new files only -> totals ACCUMULATE
    spark.createDataFrame([("a", 10.0), ("c", 7.0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second: list = []
    _run(spark, src, chk, second)
    got2 = {r.k: (r.n_events, r.value_sum) for r in second}
    assert got2["a"] == (3, 13.0)  # 2 events from run 1 + 1 new
    assert got2["c"] == (1, 7.0)
    # keys with no new events are not re-emitted in update mode
    assert "b" not in got2
