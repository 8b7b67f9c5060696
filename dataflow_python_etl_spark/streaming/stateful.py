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


# ---------------------------------------------------------------------------
# Streaming funnel: the stateful twin of operators.events.funnel
# ---------------------------------------------------------------------------

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("steps_completed", T.IntegerType()),
    ]
)

# (step reached, ts of completing event, ts of step-1 completion) in
# exact microseconds — the same quantities the batch fold carries
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("t0_us", T.LongType()),
    ]
)


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    conversion_window_days: float | None = None,
) -> DataFrame:
    """Per-user ordered-funnel progression maintained across
    micro-batches — the streaming twin of
    ``operators.events.funnel_steps_per_user``, emitting each user's
    updated ``steps_completed`` whenever their batch arrives.

    Parity contract (pinned in tests): the final state equals the
    batch funnel when each user's events are PROCESSED in event-time
    order (within a batch rows are sorted; across batches the source
    must deliver in order — true of replayed history and
    watermark-ordered feeds). An event arriving with a timestamp
    before the user's current step anchor cannot retroactively
    re-anchor the funnel — the standard streaming-funnel limitation;
    production feeds with real late data re-sort behind a watermark
    first.

    State is 3 integers per user (no timeout: a funnel must survive
    idle gaps; cap retention upstream if user cardinality is
    unbounded).
    """
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    window_us = (
        int(conversion_window_days * 86_400_000_000)
        if conversion_window_days is not None
        else None
    )
    step_list = list(steps)

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        step, ts_us, t0_us = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_vals = rows["ts"].astype("int64") // 1000  # ns -> exact µs
        types = rows["event_type"].tolist()
        for e_us, e_t in zip(ts_vals.tolist(), types):
            if step >= len(step_list) or e_t != step_list[step]:
                continue
            if step == 0:
                step, ts_us, t0_us = 1, e_us, e_us
            elif e_us > ts_us and (
                window_us is None or e_us - t0_us <= window_us
            ):
                step, ts_us = step + 1, e_us
        state.update((step, ts_us, t0_us))
        yield pd.DataFrame({"user_id": [key[0]], "steps_completed": [step]})

    return (
        events.select("user_id", "ts", "event_type", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming retention: the stateful twin of operators.events.retention_matrix
# ---------------------------------------------------------------------------

RETENTION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cohort", T.DateType()),
        T.StructField("period_offset", T.IntegerType()),
    ]
)

# (cohort week index, offsets already emitted) — Monday-start week
# index in pure integer day arithmetic, the same quantity
# date_trunc('week') computes, so the batch twin agrees bit-for-bit
RETENTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cohort_week", T.LongType()),
        T.StructField("offsets", T.ArrayType(T.IntegerType())),
    ]
)

# 1970-01-05 (epoch day 4) was a Monday
_MONDAY_EPOCH_DAY = 4


def streaming_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention over a live stream — the streaming twin
    of ``operators.events.retention_matrix``: each user joins the
    cohort of their first-seen week; whenever a batch reveals the user
    active in a week offset not yet emitted, ONE
    ``(user_id, cohort, period_offset)`` row is emitted. Because each
    (user, offset) membership is emitted exactly once (the state
    dedups), ``SELECT cohort, period_offset, count(*) FROM emissions
    GROUP BY 1, 2`` over the complete emission stream reproduces the
    batch matrix — pinned in tests.

    Parity contract (same as :func:`streaming_funnel`): cohorts anchor
    on the FIRST batch a user appears in, so event-time order across
    batches must hold (replayed history, watermark-ordered feeds); an
    out-of-order event from before the user's cohort week cannot
    retroactively re-cohort them and is ignored (emitted offsets are
    never negative). Week arithmetic is integer days since epoch with
    Monday anchoring — exactly ``date_trunc('week')`` on both engines.

    State is one long + the emitted-offset list per user (bounded by
    the retention horizon in weeks, i.e. report-sized). No timeout: a
    cohort must survive idle gaps by definition.
    """
    import datetime as _dt

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cohort_week, offsets = state.get
            seen = set(offsets)
        else:
            cohort_week, seen = None, set()
        rows = pd.concat(list(batches), ignore_index=True)
        days = rows["ts"].astype("int64") // 86_400_000_000_000  # ns -> days
        weeks = (days - _MONDAY_EPOCH_DAY) // 7  # Monday-start index
        if cohort_week is None:
            cohort_week = int(weeks.min())
        offs = {int(w) - cohort_week for w in weeks.unique()}
        fresh = sorted(o for o in offs - seen if o >= 0)
        state.update((cohort_week, sorted(seen | set(fresh))))
        if not fresh:
            return
        cohort_date = _dt.date(1970, 1, 1) + _dt.timedelta(
            days=cohort_week * 7 + _MONDAY_EPOCH_DAY
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(fresh),
                "cohort": [cohort_date] * len(fresh),
                "period_offset": fresh,
            }
        )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RETENTION_OUT_SCHEMA,
            stateStructType=RETENTION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming debounce: the stateful twin of events.debounce_events('strict')
# ---------------------------------------------------------------------------

DEBOUNCE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("kept", T.BooleanType()),
    ]
)

DEBOUNCE_STATE_SCHEMA = T.StructType([T.StructField("last_kept_us", T.LongType())])


def streaming_debounce(events: DataFrame, gap_seconds: int) -> DataFrame:
    """Strict rate limiting over a live stream — the stateful twin of
    ``operators.events.debounce_events(mode='strict')``: per
    ``(user, type)`` key an event is kept iff more than
    ``gap_seconds`` passed since the last KEPT event, the greedy
    chain re-armed on keeps. Emits every event's ``kept`` verdict;
    state is ONE long per key (the last kept timestamp in exact
    microseconds), which is the whole point — the batch fold needs
    each key's full event array, the stream needs 8 bytes.

    Parity contract (pinned): with events processed in event-time
    order (in-batch rows are sorted; across batches the source must
    deliver in order), verdicts equal the batch strict mode. No
    timeout: a rate limiter must remember its anchor across idle
    gaps; evicting would re-arm the chain and double-fire after every
    quiet period.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (last,) = state.get if state.exists else (-(1 << 62),)
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        ids = rows["event_id"].tolist()
        kept = []
        for us in ts_us:
            if us - last > gap_us:
                kept.append(True)
                last = us
            else:
                kept.append(False)
        state.update((last,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(ids),
                "event_type": [key[1]] * len(ids),
                "event_id": ids,
                "kept": kept,
            }
        )

    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update,
            outputStructType=DEBOUNCE_OUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming conversion lag: stateful twin of operators.events.conversion_lag
# ---------------------------------------------------------------------------

CONVLAG_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("lag_bucket", T.LongType()),
    ]
)

# (first step_from µs, first qualifying step_to µs); 0 = unset —
# event-time microseconds are strictly positive in this domain
CONVLAG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
    ]
)


def streaming_conversion_lag(
    events: DataFrame,
    step_from: str,
    step_to: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-user time-to-convert maintained across micro-batches — the
    stateful twin of ``operators.events.conversion_lag``: emits each
    user's ``lag_bucket`` (NULL until they convert), where the lag is
    first ``step_from`` to first STRICTLY-LATER ``step_to`` in exact
    microseconds, integer-divided into buckets exactly like the batch
    operator.

    State is TWO longs per user — the batch operator's window-min and
    conditional-min collapse to "first matching event wins" under
    in-order processing (the same parity contract as
    :func:`streaming_funnel`: in-batch rows are sorted; across batches
    the source must deliver in order). Once both anchors are set the
    state is frozen — later events cannot move a first-occurrence
    lag, so replay past the conversion is idempotent. Aggregating the
    latest non-NULL emission per user reproduces the batch histogram
    (parity-pinned in tests).
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    bucket_us = int(bucket_seconds) * 1_000_000

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        t1, t2 = state.get if state.exists else (0, 0)
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_vals = (rows["ts"].astype("int64") // 1000).tolist()
        types = rows["event_type"].tolist()
        for e_us, e_t in zip(ts_vals, types):
            if t1 == 0:
                if e_t == step_from:
                    t1 = e_us
            elif t2 == 0 and e_t == step_to and e_us > t1:
                t2 = e_us
        state.update((t1, t2))
        lag = (t2 - t1) // bucket_us if t2 else None
        yield pd.DataFrame({"user_id": [key[0]], "lag_bucket": [lag]})

    return (
        events.select("user_id", "ts", "event_type", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=CONVLAG_OUT_SCHEMA,
            stateStructType=CONVLAG_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
