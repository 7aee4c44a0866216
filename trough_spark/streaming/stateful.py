"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.B18 extension; the reference has no streaming surface).

``user_milestones``: per-user running event counter that emits one row each
time a user crosses a milestone (every ``step`` events).  The canonical
shape for "custom operator Spark's built-ins can't express": per-key mutable
state, incremental emission, timeout-based cleanup.

Scale design:
- state is one (count,) tuple per ACTIVE user — O(distinct keys), bounded
  further by the processing-time timeout that expires idle users;
- each micro-batch groups rows per key and hands them to the kernel as
  pandas frames (Arrow), so per-row Python overhead is amortized per batch;
- output is append-mode: only milestone crossings are emitted, keeping sink
  volume proportional to milestones, not events.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, milestone bigint, total_events bigint"
STATE_SCHEMA = "count bigint"


def _milestone_kernel_factory(step: int):
    def kernel(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        count = state.get[0] if state.exists else 0
        emitted = []
        for pdf in pdf_iter:
            for _ in range(len(pdf)):
                count += 1
                if count % step == 0:
                    emitted.append(
                        {"user_id": user_id, "milestone": count // step, "total_events": count}
                    )
        state.update((count,))
        state.setTimeoutDuration(60 * 60 * 1000)  # expire idle users after 1h
        if emitted:
            yield pd.DataFrame(emitted)

    return kernel


def user_milestones(events: DataFrame, step: int = 10) -> DataFrame:
    """Emit (user_id, milestone, total_events) whenever a user's cumulative
    event count crosses a multiple of ``step``.  Works on a streaming
    DataFrame; the batch equivalent is a window row_number filter (see
    tests/test_stateful.py for the cross-check)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _milestone_kernel_factory(step),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
