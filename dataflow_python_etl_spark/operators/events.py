"""Event-stream product analytics: ordered funnels and cohort
retention — the two queries every event warehouse (Amplitude/GA-style)
answers first, as declarative DataFrame plans over the ``events``
table shape (user_id, ts, event_type).

Funnel semantics: a user completes step k when an event of step k's
type occurs STRICTLY LATER than their step-(k-1) completion time
(first-occurrence progression — the standard "ordered funnel", so
``signup → click → purchase`` cannot be satisfied out of order).

The Spark shape is ONE shuffle (collect each user's events) + a JVM
higher-order fold that walks the time-sorted events advancing a step
counter — per-user event lists are the unit of work, which is exactly
how the workload shards at 100 TB. An engine without array folds
computes the same thing as k chained conditional-min aggregations
(``t_k = min(ts where type = step_k AND ts > t_{k-1})``) — the DuckDB
oracle does, and q74 pins the two formulations hash-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps_per_user(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conversion_window_days: float | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """(user, steps_completed): how far each user progressed through
    the ordered ``steps``. With ``conversion_window_days`` set, every
    later step must also land within that window of the STEP-1
    completion (the standard "converted within 7 days" metric) —
    checked in exact microseconds, so the SQL-oracle comparison is
    integer arithmetic. One shuffle; the fold is O(events·|steps|)
    per user, all JVM.

    ``max_events_per_user`` is the skew escape hatch for 100 TB runs:
    the per-user ``collect_list`` is the right unit of work, but a
    single pathological bot user would otherwise own one giant array
    (and its task). The cap keeps each user's EARLIEST N events by
    ``(ts, type)`` — deterministic by value (ties at the boundary are
    identical structs), SQL-mirrorable as a ``row_number() <= N``
    filter (q85), and applied via a streaming window rank BEFORE the
    collect so the capped array is never materialized larger than N.
    The rank shares the collect's user-keyed exchange — still one
    shuffle (plan-pinned). Semantics caveat: events beyond the cap
    cannot advance the funnel — a bounded-compute approximation the
    caller opts into (the streaming funnel, 3 ints/user, is the exact
    unbounded alternative)."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError(
            f"max_events_per_user must be >= 1, got {max_events_per_user}"
        )
    window_us = (
        int(conversion_window_days * 86_400_000_000)
        if conversion_window_days is not None
        else None
    )
    src = events.select(
        F.col(user_col).alias("user"),
        F.struct(
            F.col(ts_col).alias("ts"),
            # event id tie-break would go here; advancing requires
            # STRICTLY later ts, so same-ts order cannot matter
            F.col(type_col).alias("t"),
        ).alias("e"),
    )
    if max_events_per_user is not None:
        from pyspark.sql import Window

        # (ts, t) ordering == the array_sort order below, so the kept
        # prefix is exactly the sorted array's first N elements
        w = Window.partitionBy("user").orderBy(F.col("e.ts"), F.col("e.t"))
        src = (
            src.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_events_per_user)
            .drop("__rn")
        )
    evs = src.groupBy("user").agg(F.array_sort(F.collect_list("e")).alias("evs"))

    def advance(acc, e):
        # acc: struct(step, ts of completing event, t0 of step 1)
        out = None
        for k, name in enumerate(steps):
            cond = (acc["step"] == k) & (e["t"] == name)
            if k > 0:
                cond = cond & (e["ts"] > acc["ts"])
                if window_us is not None:
                    cond = cond & (
                        F.unix_micros(e["ts"]) - F.unix_micros(acc["t0"])
                        <= window_us
                    )
            t0 = e["ts"] if k == 0 else acc["t0"]
            nxt = F.struct(
                F.lit(k + 1).alias("step"),
                e["ts"].alias("ts"),
                t0.alias("t0"),
            )
            out = F.when(cond, nxt) if out is None else out.when(cond, nxt)
        return out.otherwise(acc)

    init = F.struct(
        F.lit(0).alias("step"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("timestamp").alias("t0"),
    )
    walked = F.aggregate(F.col("evs"), init, advance)
    return evs.select("user", walked["step"].alias("steps_completed"))


def funnel_report(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conversion_window_days: float | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """(step, step_name, users): users reaching AT LEAST each step —
    the funnel chart. Every step appears even when zero users survive
    to it (a |steps|-row broadcast spine crossed against the per-user
    frame, so no step vanishes from the report).
    ``max_events_per_user`` passes through to
    :func:`funnel_steps_per_user` (bot-user skew cap)."""
    per_user = funnel_steps_per_user(
        events,
        steps,
        user_col,
        ts_col,
        type_col,
        conversion_window_days,
        max_events_per_user,
    )
    spark = events.sparkSession
    spine = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    counts = (
        per_user.crossJoin(F.broadcast(spine))
        .groupBy("step", "step_name")
        .agg(
            F.sum((F.col("steps_completed") >= F.col("step")).cast("long")).alias(
                "users"
            )
        )
    )
    # re-anchor on the spine: with ZERO users the cross join is empty
    # and the groupBy would return an empty report — the "no step
    # vanishes" contract must hold even then (steps at 0 users)
    return spine.join(counts, ["step", "step_name"], "left").select(
        "step", "step_name", F.coalesce(F.col("users"), F.lit(0)).alias("users")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """(from_type, to_type, transitions): the first-order Markov
    transition counts of each user's time-ordered event stream — the
    "paths" view (which step follows which) behind Sankey/flow charts
    and next-action models.

    One window pass: ``lag`` over (user, ts, id) ordering — the id
    tie-break makes same-timestamp ordering deterministic cross-engine
    — then a map-side-combined count aggregation on the (from, to)
    pair. The window partitions by user, so the shuffle is the same
    user-keyed exchange every per-user analytic shares; no self-join,
    no explode. Window functions stream per partition (no per-user
    array is ever built), so the remaining bot-user exposure is the
    per-task SORT of one user's events; ``max_events_per_user`` keeps
    each user's earliest N events (``row_number() <= N`` on the same
    ordering — a second pass over the SAME user-keyed exchange) so a
    pathological user contributes a bounded stream."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    src = events
    if max_events_per_user is not None:
        if max_events_per_user < 1:
            raise ValueError(
                f"max_events_per_user must be >= 1, got {max_events_per_user}"
            )
        src = (
            events.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_events_per_user)
            .drop("__rn")
        )
    steps = src.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("transitions")
    )


def scd2_intervals(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history from an event stream:
    per entity, each CHANGE of the tracked attribute opens a validity
    interval closed by the next change (``valid_to`` NULL on the
    current row) — the temporal-table shape every warehouse keeps for
    point-in-time joins (pair with the as-of join, q35, to query it).

    Consecutive events with the same value collapse into one interval
    (SCD2 records changes, not observations). Two window passes over
    the same (entity, ts, id) ordering — one user-keyed shuffle, the
    change-filter runs between them map-side; the id tie-break makes
    same-timestamp ordering deterministic cross-engine.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    changes = (
        events.select(
            F.col(user_col).alias("entity"),
            F.col(ts_col).alias("vts"),
            F.col(id_col).alias("vid"),
            F.col(attr_col).alias("value"),
            F.lag(attr_col).over(w).alias("prev"),
        )
        .where(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
    )
    w2 = Window.partitionBy("entity").orderBy(F.col("vts"), F.col("vid"))
    nxt = F.lead("vts").over(w2)
    return changes.select(
        F.col("entity").alias(user_col),
        "value",
        F.col("vts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, period_offset, users): classic cohort retention — each
    user joins the cohort of their first-activity period; a cell
    counts cohort users active again ``offset`` periods later (offset
    0 is the cohort size). Two map-side-combined aggregations (first
    activity per user; distinct active periods per user) joined on the
    user key — the join reuses the same hash partitioning, and offsets
    are exact integer day arithmetic, so the matrix is bit-identical
    cross-engine."""
    if period not in ("week", "day", "month"):
        raise ValueError(f"period must be week|day|month, got {period}")
    days = {"week": 7, "day": 1}.get(period)
    p = F.date_trunc(period, F.col(ts_col))
    first = (
        events.select(F.col(user_col).alias("user"), p.alias("pp"))
        .groupBy("user")
        .agg(F.min("pp").alias("cohort"))
    )
    active = events.select(F.col(user_col).alias("user"), p.alias("pp")).distinct()
    if days is not None:
        offset = (
            F.datediff(F.to_date("pp"), F.to_date("cohort")) / days
        ).cast("int")
    else:
        offset = (
            (F.year("pp") - F.year("cohort")) * 12 + F.month("pp") - F.month("cohort")
        ).cast("int")
    return (
        active.join(first, "user")
        # DATE-typed cohort: period truncation is day-granular, and
        # SQL engines disagree on trunc's return type (DuckDB DATE,
        # Spark TIMESTAMP) — the date cast makes the matrix portable
        .groupBy(
            F.to_date("cohort").alias("cohort"), offset.alias("period_offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch conversion attribution: every ``conversion_type``
    event is credited to the LAST preceding non-conversion event type
    of the same user — ``(touch_type, conversions, total_value)``,
    with conversions that no touch precedes credited to ``'none'``.
    The marketing-analytics staple next to funnels and transitions
    (first-touch is the same plan with ``first`` over the same
    frame).

    One window pass: ``last(non-conversion type, ignorenulls) ROWS
    UNBOUNDED PRECEDING..CURRENT`` over the shared (user, ts, id)
    ordering — the conversion row itself contributes NULL, so the
    frame including it is safe — then one map-side-combined
    aggregation per touch type. Same single user-keyed shuffle as
    every per-user analytic here; the id tie-break keeps same-
    timestamp ordering deterministic cross-engine. ``total_value``
    rounds the sum to 2 (2-decimal inputs sum exactly on the 0.01
    grid — boundary-free rounding, unlike round(avg); docs/SCALE.md).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion_type, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        events.select(
            F.col(type_col).alias("__t"),
            F.col(value_col).alias("__v"),
            touch.alias("touch_type"),
        )
        .where(F.col("__t") == conversion_type)
        .select(F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type"), "__v")
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("conversions"),
            F.round(F.sum("__v"), 2).alias("total_value"),
        )
    )


def ab_split_metrics(
    events: DataFrame,
    conversion_type: str = "purchase",
    min_conversions: int = 1,
    salt: str = "ab-v1",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Deterministic A/B experiment readout: users hash-split 50/50 by
    the portable md5 of ``salt:user_id`` (no RNG — rerun-stable,
    engine-reproducible, and the salt versions the experiment), a
    user converts when they have ≥ ``min_conversions`` events of
    ``conversion_type``, and the one-row result carries both arms and
    the two-proportion z-score:
    ``(n_a, conv_a, n_b, conv_b, z)``.

    z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with pooled p̂ —
    integer counts until one fixed-order chain of IEEE ops (divisions,
    one correctly-rounded sqrt), so the DuckDB oracle hash-matches
    (q92); a degenerate variance (empty arm, or 0%/100% pooled rate)
    reads z = 0 explicitly rather than NaN, where engines diverge.
    Two map-side-combined aggregations (per-user conversion count,
    then one global row) — one user-keyed shuffle, output is one row
    at any scale."""
    if min_conversions < 1:
        raise ValueError(f"min_conversions must be >= 1, got {min_conversions}")
    from dataflow_python_etl_spark.functions.text import md5_hash60

    users = (
        events.groupBy(F.col(user_col).alias("user"))
        .agg(
            (
                F.sum((F.col(type_col) == conversion_type).cast("long"))
                >= min_conversions
            ).alias("converted")
        )
        .select(
            F.pmod(
                md5_hash60(F.concat(F.lit(f"{salt}:"), F.col("user").cast("string"))),
                F.lit(2),
            ).alias("g"),
            "converted",
        )
    )
    s = users.agg(
        F.sum((F.col("g") == 0).cast("long")).alias("n_a"),
        F.sum(((F.col("g") == 0) & F.col("converted")).cast("long")).alias("conv_a"),
        F.sum((F.col("g") == 1).cast("long")).alias("n_b"),
        F.sum(((F.col("g") == 1) & F.col("converted")).cast("long")).alias("conv_b"),
    )
    n_a, conv_a = F.col("n_a"), F.col("conv_a")
    n_b, conv_b = F.col("n_b"), F.col("conv_b")
    p_pool = (conv_a + conv_b) / (n_a + n_b)
    var = p_pool * (F.lit(1) - p_pool) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    z = F.when(
        (n_a > 0) & (n_b > 0) & (var > 0),
        (conv_a / n_a - conv_b / n_b) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return s.select("n_a", "conv_a", "n_b", "conv_b", F.round(z, 6).alias("z"))


def debounce_events(
    events: DataFrame,
    gap_seconds: int,
    mode: str = "session",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Telemetry debounce: per ``(user, type)`` key, mark which events
    survive a ``gap_seconds`` suppression window — returns the key
    columns + ``ts``/``id`` + a ``kept`` boolean (filter on it to
    drop the bursts; double-fired clicks and retry storms are the
    canonical inputs).

    Two published semantics, both deterministic in exact microseconds
    with the (ts, id) tie-break:

    - ``mode='session'`` (default, SQL-mirrorable — q94): keep an
      event iff more than ``gap_seconds`` passed since the PREVIOUS
      event of the key, i.e. the first event of each inactivity
      session. One ``lag`` window on the shared user-keyed exchange.
    - ``mode='strict'`` (rate limiting): keep an event iff more than
      ``gap_seconds`` passed since the last KEPT event — the greedy
      chain (events at 0s/30s/60s with a 45 s gap keep 0s AND 60s,
      where session mode keeps only 0s). Sequential by nature: a
      per-key JVM fold over the sorted event array (funnel pattern) —
      no SQL twin, pinned against a reference implementation in
      pytest. Same per-key array caveat as the funnel: cap upstream
      for pathological keys.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    if mode not in ("session", "strict"):
        raise ValueError(f"mode must be session|strict, got {mode!r}")
    gap_us = int(gap_seconds) * 1_000_000
    from pyspark.sql import Window

    if mode == "session":
        w = Window.partitionBy(user_col, type_col).orderBy(
            F.col(ts_col), F.col(id_col)
        )
        prev = F.lag(ts_col).over(w)
        return events.select(
            user_col,
            type_col,
            ts_col,
            id_col,
            (
                prev.isNull()
                | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us)
            ).alias("kept"),
        )

    evs = (
        events.select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("etype"),
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("us"),
                F.col(id_col).alias("eid"),
                F.col(ts_col).alias("ets"),
            ).alias("e"),
        )
        .groupBy("user", "etype")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )
    init = F.struct(
        F.lit(-(1 << 62)).cast("long").alias("last"),
        F.array().cast("array<boolean>").alias("flags"),
    )
    folded = F.aggregate(
        F.col("evs"),
        init,
        lambda acc, e: F.when(
            e["us"] - acc["last"] > gap_us,
            F.struct(
                e["us"].alias("last"),
                F.concat(acc["flags"], F.array(F.lit(True))).alias("flags"),
            ),
        ).otherwise(
            F.struct(
                acc["last"].alias("last"),
                F.concat(acc["flags"], F.array(F.lit(False))).alias("flags"),
            )
        ),
    )
    z = evs.select(
        "user",
        "etype",
        F.explode(F.arrays_zip(F.col("evs"), folded["flags"].alias("kept"))).alias("p"),
    )
    return z.select(
        F.col("user").alias(user_col),
        F.col("etype").alias(type_col),
        F.col("p.evs.ets").alias(ts_col),
        F.col("p.evs.eid").alias(id_col),
        F.col("p.kept").alias("kept"),
    )


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Incremental SCD2 maintenance: apply a CDC batch of observations
    to a type-2 dimension (the :func:`scd2_intervals` shape —
    ``(entity, value, valid_from, valid_to, is_current)``), closing
    current rows at the first differing change and opening new
    versions — WITHOUT rebuilding history.

    Correctness contract (pinned in tests):
    ``scd2_apply_changes(scd2_intervals(A), B) ≡ scd2_intervals(A∪B)``
    for any in-order batch B (every change strictly later than its
    entity's current ``valid_from``). The construction makes that
    identity hold by re-running the SAME interval derivation over
    just [each touched entity's current row as a virtual observation]
    ∪ [its batch changes]: consecutive same values collapse, a batch
    equal to the current value is a no-op, multiple changes per
    entity in one batch chain correctly, and unseen entities insert.
    Closed historical rows are never touched or re-derived — the
    per-batch cost is (touched entities + batch), not table history.

    An out-of-order change (ts ≤ its entity's current ``valid_from``)
    would silently rewrite closed history, so it fails LOUDLY via the
    repo's filter-anchored raise_error pattern (a dead projected
    guard column would be pruned). One entity-keyed shuffle family.
    """
    cur = dim.where(F.col("is_current")).select(
        F.col(user_col).alias("__k"),
        F.col("value").alias("__v"),
        F.col("valid_from").alias("__vf"),
    )
    ch = changes.select(
        F.col(user_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.col(attr_col).alias("__attr"),
        F.col(id_col).alias("__id"),
    )
    # loud out-of-order guard, filter-anchored (CLAUDE.md invariant)
    guarded = (
        ch.join(cur.select("__k", "__vf"), "__k", "left")
        .where(
            F.when(
                F.col("__vf").isNotNull() & (F.col("__ts") <= F.col("__vf")),
                F.raise_error(
                    F.concat(
                        F.lit("scd2_apply_changes: out-of-order change for entity "),
                        F.col("__k").cast("string"),
                        F.lit(" at "),
                        F.col("__ts").cast("string"),
                        F.lit(" (not after current valid_from "),
                        F.col("__vf").cast("string"),
                        F.lit(") — it would rewrite closed history"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .drop("__vf")
    )
    touched_keys = guarded.select("__k").distinct()
    # each touched entity's current row re-enters as a virtual
    # observation carrying its original valid_from; ids never tie
    # with batch ids at the same ts because the guard excludes
    # ts <= valid_from
    virtual = cur.join(touched_keys, "__k", "left_semi").select(
        "__k",
        F.col("__vf").alias("__ts"),
        F.col("__v").alias("__attr"),
        F.lit(-1).cast("long").alias("__id"),
    )
    merged = virtual.unionByName(guarded)
    recomputed = scd2_intervals(
        merged, user_col="__k", ts_col="__ts", attr_col="__attr", id_col="__id"
    ).select(
        F.col("__k").alias(user_col),
        "value",
        "valid_from",
        "valid_to",
        "is_current",
    )
    untouched_current = dim.where(F.col("is_current")).join(
        touched_keys.withColumnRenamed("__k", user_col), user_col, "left_anti"
    )
    historical = dim.where(~F.col("is_current"))
    return historical.unionByName(untouched_current).unionByName(recomputed)


def peak_concurrency(
    events: DataFrame,
    gap_seconds: int = 300,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning
    readout: sessionize each user by inactivity gap (same rule as
    q32), turn each session into ``[start, end]`` endpoints, and
    sweep: +1/−1 deltas in global time order with a running sum;
    report ``(day, peak_concurrent)`` = the max of the running count
    at any endpoint inside the day.

    Determinism: endpoints sort by ``(ts, −delta, user, session)`` —
    +1 before −1 at equal timestamps: sessions are CLOSED intervals,
    active at both their start and end instants, so a session ending
    exactly when another starts overlaps it for that instant, and a
    single-event session (start == end) still counts itself
    (documented boundary policy, identical in the SQL mirror). All
    integer arithmetic.

    Scale shape: the sweep runs over SESSION ENDPOINTS (2 rows per
    session — orders of magnitude under the event count) in one
    globally-ordered window; exact concurrency is inherently a total
    order, so this single-partition pass is the honest cost, and its
    input is endpoint-sized, not event-sized. Days without any
    endpoint (possible only when every session spans the whole day —
    sessions bounded by the inactivity gap make that impossible) are
    omitted.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    flagged = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.when(
            prev.isNull()
            | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_seconds * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("ns"),
    )
    sess = (
        flagged.withColumn("sid", F.sum("ns").over(
            Window.partitionBy("u").orderBy(F.col("t"), F.col("i")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ))
        .groupBy("u", "sid")
        .agg(F.min("t").alias("start"), F.max("t").alias("end"))
    )
    deltas = sess.select(
        F.col("start").alias("t"), F.lit(1).alias("d"), "u", "sid"
    ).unionByName(
        sess.select(F.col("end").alias("t"), F.lit(-1).alias("d"), "u", "sid")
    )
    sweep = Window.orderBy(
        F.col("t"), (-F.col("d")), F.col("u"), F.col("sid")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = deltas.select(
        F.to_date("t").alias("day"), F.sum("d").over(sweep).alias("live")
    )
    return running.groupBy("day").agg(
        F.max("live").cast("long").alias("peak_concurrent")
    )


def _global_ranked(df: DataFrame, order_by, partitions: int) -> DataFrame:
    """Shared distributed total-order machinery under
    :func:`global_rank` and :func:`global_ntile`: range-repartition
    on the sort keys, rank within each partition via
    ``monotonically_increasing_id`` taken AFTER sortWithinPartitions
    (post-sort, mid's per-partition ordinal IS the sort rank — a
    pid-keyed row_number window would add a second data-sized
    exchange), and broadcast each partition's prefix offset back.
    Returns the frame with ``_rn`` (in-partition rank), ``_off``
    (prefix offset) and ``_n`` (total rows); the frame sits behind a
    REGISTERED persist because mid values are execution-dependent and
    the sizes/ranked branches must read ONE materialization."""
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.dedup import register_cache

    sort_cols = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order_by
    ]
    part = register_cache(
        df.repartitionByRange(partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftright(F.col("_mid"), 33)
    ordinal = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    sizes = part.groupBy(pid.alias("_pid")).agg(F.count(F.lit(1)).alias("_cnt"))
    tiny = Window.orderBy("_pid")  # partitions-row frame, not data-sized
    offsets = sizes.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(tiny.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
        F.sum("_cnt")
        .over(tiny.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("_n"),
    )
    return part.withColumn("_pid", pid).withColumn("_rn", ordinal + 1).join(
        F.broadcast(offsets), "_pid"
    )


def global_rank(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    out_col: str,
    partitions: int = 32,
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY ...)`` over a TOTAL order
    without the single-partition window — the rank sibling of
    :func:`global_ntile` (same distributed machinery, same
    total-order requirement: append an id tie-break)."""
    ranked = _global_ranked(df, order_by, partitions)
    return ranked.withColumn(
        out_col, (F.col("_off") + F.col("_rn")).cast("long")
    ).drop("_mid", "_pid", "_rn", "_off", "_n")


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: list[tuple[str, str]],
    out_col: str,
    partitions: int = 32,
) -> DataFrame:
    """Exact SQL ``NTILE(n)`` over a TOTAL order without the
    single-partition window Spark's own ``ntile`` plans.

    ``Window.orderBy(...)`` with no partition key funnels every row
    through ONE task — the classic global-ranking scale wall. This
    spells the same result as a distributed plan: range-repartition on
    the sort keys (each partition owns a contiguous key range), rank
    within each partition, then add each partition's prefix offset
    (computed from the partition SIZES — a ``partitions``-row frame —
    and broadcast back). Final buckets depend only on the total order,
    never on where the sampled range boundaries fall.

    Within-partition ranks come from ``monotonically_increasing_id``
    taken AFTER ``sortWithinPartitions``: mid = pid·2³³ + the record's
    ordinal in partition-iteration order, which post-sort IS the sort
    rank — no pid-partitioned ``row_number`` window, whose
    ``ClusteredDistribution(_pid)`` requirement would silently add a
    SECOND data-sized hash exchange on top of the range one (measured;
    the plan pin now asserts no Window at all). mid values are
    execution-dependent, so the frame is routed through
    ``register_cache``: the sizes branch and the ranked branch read
    ONE materialization (also how both observe the same sampled range
    boundaries — Spark's range sampler is seeded per RDD id). Only the
    ``partitions``-row sizes aggregate shuffles besides the range
    exchange itself.

    ``order_by`` is ``[(col, "asc"|"desc"), ...]`` and must reach a
    TOTAL order (append an id tie-break) — ties across a partition
    boundary would otherwise make ranks boundary-dependent. Bucket
    sizes follow SQL NTILE exactly: the first ``n mod b`` buckets get
    the extra row, so the result is bit-identical to
    ``ntile(b) OVER (ORDER BY ...)`` on any engine.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    ranked = _global_ranked(df, order_by, partitions)
    rank = F.col("_off") + F.col("_rn")
    b = F.lit(n_buckets).cast("long")
    small = F.floor(F.col("_n") / b)
    big = small + F.lit(1)
    extra = F.col("_n") % b
    threshold = extra * big
    bucket = (
        F.when(rank <= threshold, F.floor((rank - 1) / big) + 1)
        .otherwise(
            extra + F.floor((rank - threshold - 1) / F.greatest(small, F.lit(1))) + 1
        )
        .cast("int")
    )
    return ranked.withColumn(out_col, bucket).drop(
        "_mid", "_pid", "_rn", "_off", "_n"
    )


def rfm_segments(
    txns: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
    n_buckets: int = 5,
    partitions: int = 32,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    customer-base cut over any ``(entity, ts, amount)`` transaction
    stream: per entity, when did they last act, how often, and for how
    much; each metric quintiled (``n_buckets``) over the WHOLE base and
    the base reported per ``r-f-m`` segment cell.

    One entity-keyed shuffle builds the per-entity profile (map-side
    combined aggregates), then three :func:`global_ntile` passes score
    it — each a distributed range-rank, never a single-task global
    window, so the scoring scales with the ENTITY dimension (billions
    of customers shard across ``partitions``). Rankings follow the repo
    discipline: ROUNDED monetary + entity-id tie-break on every key, so
    cross-engine ULP noise cannot flip a bucket. Output is
    segment-cell-sized (≤ n_buckets³ rows) at any input scale; monetary
    sums of 2-decimal data stay on the 0.01 grid (boundary-free
    round 2).
    """
    per = txns.groupBy(F.col(entity_col).alias("entity")).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum(amount_col), 2).alias("monetary"),
    )
    scored = global_ntile(
        per, n_buckets, [("last_ts", "desc"), ("entity", "asc")], "r", partitions
    )
    scored = global_ntile(
        scored, n_buckets, [("freq", "desc"), ("entity", "asc")], "f", partitions
    )
    scored = global_ntile(
        scored, n_buckets, [("monetary", "desc"), ("entity", "asc")], "m", partitions
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.round(F.sum("monetary"), 2).alias("total_monetary"),
    ).select(
        F.concat_ws("-", "r", "f", "m").alias("segment"),
        "n_entities",
        "total_monetary",
    )


def conversion_lag(
    events: DataFrame,
    step_from: str,
    step_to: str,
    bucket_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution — ``(lag_bucket, n_users)``: for
    every user who completed ``step_from`` then ``step_to`` (ordered,
    first-occurrence semantics matching the funnel family), the lag
    between the two completions bucketed at ``bucket_seconds``. The
    "how long does conversion take" histogram that sits beside the
    funnel's "how many convert".

    ONE user-keyed shuffle: the step_from completion time is a window
    min over the user partition and the step_to conditional min
    aggregates on the same key, so the window and the groupBy share
    one exchange. Lags are exact integer microseconds and the bucket
    is INTEGER division (``div``) — a double division's correctly-
    rounded quotient can land exactly on the next integer and flip
    ``floor`` cross-engine; integer division cannot. Output is
    bucket-count-sized at any scale.
    """
    from pyspark.sql import Window

    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    bucket_us = int(bucket_seconds) * 1_000_000
    u, t, k = F.col(user_col), F.col(ts_col), F.col(type_col)
    w = Window.partitionBy(user_col)
    base = events.select(user_col, ts_col, type_col).withColumn(
        "t1_us",
        F.unix_micros(F.min(F.when(k == step_from, t)).over(w)),
    )
    per = (
        base.groupBy(user_col)
        .agg(
            F.min("t1_us").alias("t1_us"),
            F.min(
                F.when(
                    (k == step_to) & (F.unix_micros(t) > F.col("t1_us")),
                    F.unix_micros(t),
                )
            ).alias("t2_us"),
        )
        .where(F.col("t2_us").isNotNull())
    )
    return (
        per.select(
            F.expr(f"(t2_us - t1_us) div {bucket_us}").alias("lag_bucket")
        )
        .groupBy("lag_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def inter_event_cadence(
    events: DataFrame,
    bucket_seconds: int = 60,
    max_bucket: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-event gap histogram: per event type, how long after a
    user's PREVIOUS event (any type) does this type arrive —
    ``(grp, bucket, n_gaps)`` with the gap integer-divided into
    ``bucket_seconds`` buckets and everything ≥ ``max_bucket``
    buckets clamped into the top bucket (so the output is bounded
    ``|types|·(max_bucket+1)`` rows however long the tail). The
    activity-cadence profile that sizes debounce gaps
    (:func:`debounce_events`) and session timeouts empirically
    instead of by folklore.

    Exact-µs arithmetic with INTEGER division (a correctly-rounded
    double quotient can land on the next integer and flip floor
    cross-engine — the q101 rule); each user's first event has no
    predecessor and contributes nothing. One user-keyed exchange for
    the lag window, then a map-side-combined aggregate onto the
    bounded (type, bucket) key space.
    """
    from pyspark.sql import Window

    if bucket_seconds <= 0 or max_bucket <= 0:
        raise ValueError("bucket_seconds and max_bucket must be > 0")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    bucket = F.least(
        F.expr(f"__gap_us div {bucket_seconds * 1_000_000}"), F.lit(max_bucket)
    )
    return (
        events.select(
            F.col(type_col).alias("grp"), gap_us.alias("__gap_us")
        )
        .where(F.col("__gap_us").isNotNull())
        .select("grp", bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
    )


def attribution_multitouch(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's credit is
    split EQUALLY across every touch in its journey (the touches
    since the user's previous conversion), complementing
    :func:`attribution`'s last-touch winner-takes-all —
    ``(touch_type, credit_ppm)`` where total credit is exactly
    ``n_conversions · 10⁶`` (pinned).

    Exact-integer credit: each of a journey's k touches gets
    ``10⁶ div k`` ppm and the EARLIEST touch absorbs the remainder
    ``10⁶ mod k`` — deterministic, sums exactly, no floats to
    accumulate differently across engines or partition orders.
    Journeys are numbered by the count of STRICTLY-PRECEDING
    conversions (an exclusive-frame running sum), so a conversion
    with no touches credits ``'none'`` and touches after a user's
    last conversion credit nothing.

    Scale shape: one user-keyed exchange drives the journey
    numbering; the (user, journey) window and join re-use that
    clustering (a partitioning on ``user`` co-locates every
    ``(user, journey)``), and the final aggregate collapses
    map-side onto the touch-type vocabulary.
    """
    from pyspark.sql import Window

    is_conv = (F.col(type_col) == conversion_type).cast("long")
    w_excl = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__t"),
        is_conv.alias("__c"),
        F.coalesce(F.sum(is_conv).over(w_excl), F.lit(0)).alias("__j"),
    )
    conv = o.where(F.col("__c") == 1).select("__u", "__j")
    wj = Window.partitionBy("__u", "__j").orderBy(F.col("__ts"), F.col("__id"))
    touches = (
        o.where(F.col("__c") == 0)
        .select(
            "__u",
            "__j",
            "__t",
            F.row_number().over(wj).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy("__u", "__j")).alias("__k"),
        )
    )
    matched = touches.join(conv, ["__u", "__j"])
    credited = matched.groupBy(F.col("__t").alias("touch_type")).agg(
        F.sum(
            F.expr("1000000 div __k")
            + F.when(F.col("__rn") == 1, F.expr("1000000 % __k")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("credit_ppm")
    )
    orphan = (
        conv.join(touches.select("__u", "__j").distinct(), ["__u", "__j"], "left_anti")
        .agg((F.count(F.lit(1)) * F.lit(1_000_000)).cast("long").alias("credit_ppm"))
        .select(F.lit("none").alias("touch_type"), "credit_ppm")
    )
    return (
        credited.unionAll(orphan)
        .groupBy("touch_type")
        .agg(F.sum("credit_ppm").cast("long").alias("credit_ppm"))
    )


def active_user_stickiness(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU/WAU stickiness: per observed day, the daily actives, the
    trailing-``window_days`` actives, and their ratio in integer ppm
    — the product-health metric next to retention (how much of the
    weekly audience shows up on a given day).

    The trailing-distinct is NOT a sliding window over raw events
    (distinct doesn't decompose over window frames): the scalable
    shape is dedup to (user, day) once — the only data-sized shuffle
    — then EXPLODE each user-day into the ≤ ``window_days`` window
    days it contributes to and equality-join that against the
    broadcast observed-day spine (never a nested-loop range join,
    whose cost is |user-days|·|spine|). The fan-out is a bounded
    ``window_days``× and the final count_distinct collapses per day.
    Ratio = ``dau·10⁶ div wau`` — positive-operand integer division
    (the q110 rule); days before the first window are still reported
    (their window is simply shorter, the standard trailing-metric
    convention).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    ud = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).cast("date").alias("d")
    ).distinct()
    spine = ud.select(F.col("d").alias("day")).distinct()
    contrib = ud.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("day"),
    )
    wau = (
        contrib.join(F.broadcast(spine), "day")
        .groupBy("day")
        .agg(F.count_distinct("u").cast("long").alias("wau"))
    )
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    return dau.join(wau, "day").select(
        "day", "dau", "wau", F.expr("dau * 1000000 div wau").alias("stickiness_ppm")
    )


def attribution_timedecay(
    events: DataFrame,
    conversion_type: str = "purchase",
    halflife_days: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-decay attribution: a conversion's credit is split across
    its journey's touches with weights HALVING per ``halflife_days``
    of age at conversion time — the standard recency model between
    last-touch (:func:`attribution`) and linear
    (:func:`attribution_multitouch`). ``(touch_type, credit_ppm)``
    with total credit exactly ``n_conversions · 10⁶`` (pinned, the
    q113 conservation law).

    Exact-integer weights BY CONSTRUCTION: age in whole half-lives
    is an exact-µs integer division, and the weight is the power of
    two ``2^(30 − min(age, 30))`` (shiftleft on a bigint — ages
    beyond 30 half-lives saturate at weight 1; 2^30 caps the per-
    touch product ``10⁶·w`` at ~1.1e15, far inside int64). Per-touch
    credit is ``(10⁶·w) div Σw`` with the journey's rounding
    remainder absorbed by the NEAREST touch — deterministic,
    conserving, float-free. Journeys, orphan conversions ('none'),
    and the one-user-keyed-exchange scale shape all mirror
    :func:`attribution_multitouch`.
    """
    from pyspark.sql import Window

    if halflife_days < 1:
        raise ValueError(f"halflife_days must be >= 1, got {halflife_days}")
    is_conv = (F.col(type_col) == conversion_type).cast("long")
    w_excl = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__t"),
        is_conv.alias("__c"),
        F.coalesce(F.sum(is_conv).over(w_excl), F.lit(0)).alias("__j"),
    )
    conv = o.where(F.col("__c") == 1).select(
        "__u", "__j", F.col("__ts").alias("__cts")
    )
    touches = o.where(F.col("__c") == 0).select("__u", "__j", "__t", "__ts", "__id")
    hl_us = halflife_days * 86_400_000_000
    m = touches.join(conv, ["__u", "__j"]).select(
        "__u", "__j", "__t", "__ts", "__id",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), 30 - CAST(least((unix_micros(__cts) "
            f"- unix_micros(__ts)) div {hl_us}, 30) AS INT))"
        ).alias("__w"),
    )
    wj = Window.partitionBy("__u", "__j")
    wn = Window.partitionBy("__u", "__j").orderBy(
        F.col("__ts").desc(), F.col("__id").desc()
    )
    # the journey's rounding remainder goes to the nearest touch
    per_journey = m.select(
        "__u", "__j", "__t", "__ts", "__id",
        F.expr("1000000 * __w").alias("__num"),
        F.sum("__w").over(wj).alias("__sw"),
        F.row_number().over(wn).alias("__near"),
    ).withColumn("__base", F.expr("__num div __sw")).withColumn(
        "__jbase", F.sum("__base").over(wj)
    )
    credited = per_journey.groupBy(F.col("__t").alias("touch_type")).agg(
        F.sum(
            F.col("__base")
            + F.when(F.col("__near") == 1, F.lit(1_000_000) - F.col("__jbase"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("credit_ppm")
    )
    orphan = (
        conv.join(touches.select("__u", "__j").distinct(), ["__u", "__j"], "left_anti")
        .agg((F.count(F.lit(1)) * F.lit(1_000_000)).cast("long").alias("credit_ppm"))
        .select(F.lit("none").alias("touch_type"), "credit_ppm")
    )
    return (
        credited.unionAll(orphan)
        .groupBy("touch_type")
        .agg(F.sum("credit_ppm").cast("long").alias("credit_ppm"))
    )


def growth_accounting(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly growth accounting: every active user-week is classified
    as NEW (first week ever), RETAINED (also active the prior week)
    or RESURRECTED (active before, but not the prior week), and every
    lapse is booked as CHURNED in the first inactive week — the
    standard growth ledger (new + retained + resurrected − prior
    churn reconciles the active base week over week). Complements
    :func:`retention_matrix` (cohort view) and q119's cumulative
    sign-ups with the week-over-week flow view.

    Scale shape: the fact is scanned ONCE and exchanged ONCE — an
    explicit repartition on user feeds both the (user, week) dedup
    agg (hash(u) satisfies the (u, wk) clustering) and the lag/lead
    window. Each classified user-week then EXPLODES into its own
    ledger entry plus (when the user lapses) a 'churned' entry at
    week+7 — so the weekly rollup is one pass, not two branches that
    would each recompute the fact-sized upstream. Churn is clipped
    to the observed horizon (max ACTIVE week) by a window over the
    |weeks|-sized rollup — no second fact scan, no crossJoin. All
    outputs are exact integer counts.
    """
    from pyspark.sql import Window

    uw = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
        )
        .repartition("u")
        .groupBy("u", "wk")
        .agg(F.lit(1).alias("__one"))
    )
    w = Window.partitionBy("u").orderBy("wk")
    status = uw.select(
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    ).select(
        "wk",
        F.when(F.col("prev_wk").isNull(), F.lit("new"))
        .when(F.col("prev_wk") == F.date_sub(F.col("wk"), 7), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("st"),
        F.when(
            F.col("next_wk").isNull() | (F.col("next_wk") > F.date_add(F.col("wk"), 7)),
            F.lit("churned"),
        ).alias("ch"),
    )
    ledger = status.select(
        F.explode(
            F.array(
                F.struct(F.col("wk").alias("week"), F.col("st").alias("st")),
                F.struct(F.date_add("wk", 7).alias("week"), F.col("ch").alias("st")),
            )
        ).alias("e")
    ).where(F.col("e.st").isNotNull())
    weekly = ledger.groupBy(F.col("e.week").alias("week")).agg(
        F.sum((F.col("e.st") == "new").cast("long")).alias("new_users"),
        F.sum((F.col("e.st") == "retained").cast("long")).alias("retained_users"),
        F.sum((F.col("e.st") == "resurrected").cast("long")).alias("resurrected_users"),
        F.sum((F.col("e.st") == "churned").cast("long")).alias("churned_users"),
        F.max(F.col("e.st") != "churned").alias("__active"),
    )
    horizon = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        weekly.withColumn(
            "__max_active",
            F.max(F.when(F.col("__active"), F.col("week"))).over(horizon),
        )
        .where(F.col("week") <= F.col("__max_active"))
        .select("week", "new_users", "retained_users", "resurrected_users", "churned_users")
    )


def top_paths(
    events: DataFrame,
    n_steps: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top user journeys: each user's first ``n_steps`` event types
    (ts then id order) joined into a path string, counted across
    users — the path-analysis view beside :func:`event_transitions`
    (which sees only adjacent pairs). ``(path, n_users)``.

    Scale shape: the ``row_number() <= n_steps`` filter plans as a
    PARTIAL WindowGroupLimit, truncating each map task to n_steps
    rows per user BEFORE the user exchange (the repo's free-skew-
    protection shape — a bot user with 10⁶ events ships n_steps rows
    per task, and the per-user collect is ≤ n_steps structs by
    construction, so the q74 bot-array caveat doesn't apply here).
    The per-user assembly reuses the window's user partitioning
    (zero extra exchange); the path rollup is user-sized → path-
    sized; top-k is a distributed TakeOrdered with ties broken by
    the path string itself."""
    from pyspark.sql import Window

    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    src = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("t"),
    )
    # window and groupBy must key on the SAME attribute (the alias) —
    # partitioning on the pre-alias column makes Catalyst treat them
    # as different keys and re-exchange the per-user frame
    w = Window.partitionBy("u").orderBy(F.col("__ts"), F.col("__id"))
    paths = (
        src.select("u", "t", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= n_steps)
        .groupBy("u")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "t"))),
                    lambda s: s["t"],
                ),
                " > ",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(top_k)
    )
