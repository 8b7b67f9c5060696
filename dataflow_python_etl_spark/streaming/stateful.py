"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user running aggregates maintained across micro-batches.

This is the escape hatch for stateful semantics the built-in windowed
aggregations can't express (SURVEY.md §2.4 / driver brief): state is
partitioned by key and lives in the state store, updates arrive as
Arrow batches, and a processing-time timeout garbage-collects idle
keys — no driver involvement, scales with the key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


IDLE_TIMEOUT_MS = 30 * 60 * 1000  # GC state for users idle > 30 min


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # Idle key: evict its state so the store doesn't grow without
        # bound with key cardinality. Emit nothing.
        state.remove()
        return
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user event count / sum / max across micro-batches.
    A processing-time timeout (``IDLE_TIMEOUT_MS``) garbage-collects
    idle keys — long-running jobs don't accumulate state for users
    that stopped producing events.

    Eviction is a RESET, not a pause: a user returning after the idle
    timeout restarts at zero, so emitted totals are per-activity-epoch
    ("counts since the user was last idle >30 min"), not all-time.
    Consumers needing all-time totals must fold epochs downstream (sum
    per user over the emitted rows' maxima) or raise the timeout —
    state then grows with total key cardinality, the documented
    trade-off this GC exists to cap."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
