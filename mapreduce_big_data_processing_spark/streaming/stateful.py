"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY §2.10); this is the engine
extension for operators whose state outlives a window — running per-key
totals, custom sessionization with carry-over, model-score accumulators.
State lives in the state store (checkpointed, partition-local); each
micro-batch hands the group's new rows + prior state to an Arrow-batched
pandas function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals across the whole stream: cumulative event
    count and value sum, emitted once per micro-batch per active user.

    Output: (user_id, n_events, total_value). State: (cnt long, total double).
    """

    def update(key, pdfs, state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="cnt long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
