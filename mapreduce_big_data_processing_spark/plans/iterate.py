"""Driver-loop iteration harness with lineage control (SURVEY.md §4).

The one genuinely Spark-specific engineering hazard in this engine:
iterative algorithms (PageRank `ppt/Ch8….pdf p.26-27`, K-Means
`ppt/Ch9….pdf p.21-39`, LPA `…课程设计2….pdf p.5`) grow the logical plan
every round — the reference never faced this because each Hadoop iteration
was a full HDFS materialization. `iterate` truncates lineage with
`localCheckpoint` on a cadence; on a real cluster with a checkpoint dir,
swap for reliable `checkpoint()` (localCheckpoint loses data on executor
failure — acceptable in local mode, a trade-off at scale).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iter: int,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Run ``state = step(state, i)`` for max_iter rounds, checkpointing
    eagerly every ``checkpoint_every`` rounds to keep plans bounded."""
    for i in range(max_iter):
        state = step(state, i)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return state


def iterate_until(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    converged: Callable[[DataFrame, DataFrame], bool],
    max_iter: int,
    checkpoint_every: int = 5,
) -> tuple[DataFrame, int]:
    """Convergence-test variant (`ppt/Ch8….pdf p.26` alternative 2): stop
    when ``converged(prev, cur)`` — a driver-side scalar test (e.g.
    Σ|Δpr| < ε). Returns (state, rounds_run)."""
    for i in range(max_iter):
        prev = state
        state = step(state, i)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
        if converged(prev, state):
            return state, i + 1
    return state, max_iter
