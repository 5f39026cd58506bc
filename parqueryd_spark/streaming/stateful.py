"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the escape hatch for operators Structured Streaming's built-ins
can't express: arbitrary per-key state evolved batch-by-batch (here, a
running per-user event count + value total emitted on every trigger). State is
per-key and Arrow-batched — the Pandas UDF path, not row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def stream_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in operator state and
    re-emitted each trigger.

    The update function is defined inline so cloudpickle ships it by value —
    executor Python workers don't need ``parqueryd_spark`` on their path.
    """

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
