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


def streaming_heavy_hitters(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    capacity: int = 64,
) -> DataFrame:
    """Streaming frequent-items per group: a Misra-Gries summary held in
    arbitrary stateful state (applyInPandasWithState), updated per
    micro-batch with the same mergeable-summaries subtraction rule as the
    batch operator (`operators.sketches.heavy_hitters`).

    State per group is bounded at ``capacity`` counters regardless of
    stream length — the property that makes this safe for unbounded
    streams where exact per-value counts would grow without limit. Emitted
    counts are MG lower bounds (undercount ≤ n_group/(capacity+1)); any
    value whose true count exceeds that bound is guaranteed present.

    Output per trigger: (group, value string, count_lb) — the group's
    current candidate set.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            keys, cnts = state.get
            counters = dict(zip(keys, cnts))
        else:
            counters = {}
        for pdf in pdfs:
            vc = pdf[value_col].astype(str).value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                m = sorted(counters.values(), reverse=True)[capacity]
                counters = {k: c - m for k, c in counters.items() if c > m}
        state.update(
            ([str(k) for k in counters], [int(c) for c in counters.values()])
        )
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(counters),
                "value": list(counters.keys()),
                "count_lb": list(counters.values()),
            }
        )

    gtype = dict(events.dtypes)[group_col]
    return events.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=f"{group_col} {gtype}, value string, count_lb long",
        stateStructType="keys array<string>, cnts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
