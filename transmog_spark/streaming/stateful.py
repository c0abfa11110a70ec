"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in window/session state operators can't express —
here, per-key running totals that survive across micro-batches (the
pattern behind streaming dedup counters, per-source ingest quotas, and
incremental per-doc token accounting). Arrow-batched: the user function
sees pandas DataFrames, never Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    *,
    count_col: str = "n_events",
    sum_col: str = "value_sum",
) -> DataFrame:
    """Per-key cumulative (count, sum) maintained in the state store.

    Each micro-batch emits one row per key seen in that batch with the
    TOTALS SO FAR (across all batches since the checkpoint began) — the
    streaming analog of an ever-growing groupBy, with O(keys) state.
    """
    out_schema = f"{key_col} string, {count_col} long, {sum_col} double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        import pandas as pd

        yield pd.DataFrame({key_col: [key[0]], count_col: [n], sum_col: [s]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
