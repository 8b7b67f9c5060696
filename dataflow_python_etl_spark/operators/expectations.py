"""Declarative data-quality expectations — the post-load validation
step (Deequ/Great-Expectations style) a pipeline runs before trusting
a new drop of data: completeness, key uniqueness, value ranges,
accepted value sets, each as a named check with an observed metric, a
threshold, and a verdict.

ALL checks evaluate in ONE groupBy-less aggregation pass (map-side
partial aggregation, single-row combine — the profile_agg shape), so
a 50-check suite costs one scan of the table at 100 TB, never one
scan per check. The single metrics row then unpivots to one row per
check via a JVM ``stack`` — O(#checks), never O(rows).

Every observed metric is a ratio of exact integer counts rounded to
6 places, so verdicts are bit-identical cross-engine (oracle-
mirrorable with no ULP risk).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named check: ``observed`` (a full-table aggregate expression
    producing a [0, 1] metric) compared against ``threshold`` with
    ``passed = observed >= threshold``."""

    name: str
    observed: Column
    threshold: float


def _frac(cond: Column) -> Column:
    """Fraction of rows satisfying ``cond`` — exact integer ratio.
    An EMPTY table yields 0.0 (not NULL): a quality gate that can
    neither pass nor fail an empty drop would wave it through, the
    exact failure it exists to catch."""
    return F.coalesce(F.sum(cond.cast("long")), F.lit(0)) / F.greatest(
        F.count(F.lit(1)), F.lit(1)
    )


def completeness(col: str, threshold: float = 1.0) -> Expectation:
    return Expectation(
        f"completeness({col})", _frac(F.col(col).isNotNull()), threshold
    )


def uniqueness(cols: list[str], threshold: float = 1.0) -> Expectation:
    """distinct(key) / rows — 1.0 means the columns form a key.
    The key is counted as a STRUCT tuple so rows with NULL components
    still count as distinct values — matching DuckDB's
    ``count(DISTINCT (a, b))`` row semantics (bare multi-arg
    count_distinct would silently DROP null-component rows and
    diverge from the oracle on nullable keys)."""
    return Expectation(
        f"uniqueness({','.join(cols)})",
        F.count_distinct(F.struct(*[F.col(c) for c in cols]))
        / F.greatest(F.count(F.lit(1)), F.lit(1)),
        threshold,
    )


def in_range(col: str, lo: float, hi: float, threshold: float = 1.0) -> Expectation:
    return Expectation(
        f"in_range({col},{lo},{hi})",
        _frac(F.col(col).between(lo, hi)),
        threshold,
    )


def accepted_values(col: str, values: tuple, threshold: float = 1.0) -> Expectation:
    return Expectation(
        f"accepted_values({col})", _frac(F.col(col).isin(*values)), threshold
    )


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate the suite in one aggregation pass.

    Returns ``(check, observed, threshold, passed)`` — one row per
    expectation, observed rounded to 6 places, verdicts computed on
    the rounded value (the repo's cross-engine invariant)."""
    if not expectations:
        raise ValueError("expectations must be non-empty")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")
    metrics = df.agg(
        *[F.round(e.observed, 6).alias(f"m{i}") for i, e in enumerate(expectations)]
    )
    # one row -> |checks| rows, driver-free: stack is a JVM generator
    stack_args = ", ".join(
        f"'{e.name}', m{i}, cast({e.threshold} as double)"
        for i, e in enumerate(expectations)
    )
    return metrics.select(
        F.expr(
            f"stack({len(expectations)}, {stack_args}) as (check, observed, threshold)"
        )
    ).withColumn("passed", F.col("observed") >= F.col("threshold"))


def winsorize_bounds(
    df: DataFrame,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    group_col: str | None = None,
) -> DataFrame:
    """Winsorization report per group (or one global row):
    ``(group?, p_lo, p_hi, n_below, n_above, n_total)`` — the exact
    interpolated percentile clip bounds for ``value_col`` and how many
    rows each tail would clip. The outlier-capping staple of feature
    cleaning; apply the clip itself with
    ``least(greatest(v, p_lo), p_hi)`` against the broadcast bounds.

    Two aggregations over one scan shape: the bounds row(s) (exact
    ``percentile`` — q34's cross-engine-proven mechanism) broadcast
    back onto the column for the tail counts. Counts are integers;
    the bounds are each ONE interpolation, rounded to 6 — nothing
    accumulates float error (a sum of clipped values would: the
    interpolated bound is an arbitrary double repeated per clipped
    row, so its sum leaves the exact-decimal grid — report counts,
    let the caller clip).
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}/{upper}")
    keys = [group_col] if group_col else []
    v = df.select(*keys, F.col(value_col).alias("v"))
    bounds = v.groupBy(*keys).agg(
        F.round(F.percentile("v", F.lit(lower)), 6).alias("p_lo"),
        F.round(F.percentile("v", F.lit(upper)), 6).alias("p_hi"),
    )
    joined = (
        v.join(F.broadcast(bounds), keys) if keys else v.crossJoin(F.broadcast(bounds))
    )
    return joined.groupBy(*keys, "p_lo", "p_hi").agg(
        F.sum((F.col("v") < F.col("p_lo")).cast("long")).alias("n_below"),
        F.sum((F.col("v") > F.col("p_hi")).cast("long")).alias("n_above"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    ).select(*keys, "p_lo", "p_hi", "n_below", "n_above", "n_total")


def winsorize_bounds_by_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower_ppm: int = 50_000,
    upper_ppm: int = 950_000,
    precision_bits: int | None = None,
) -> DataFrame:
    """The 100 TB path for :func:`winsorize_bounds`: the same
    ``(group…, p_lo, p_hi, n_below, n_above, n_total)`` report read
    ENTIRELY off a mergeable quantile sketch
    (``operators.sketches.quantile_sketch``) — bounds AND tail
    counts, in one scan of the data total.

    The exact version costs a sort-based ``percentile`` per group
    plus a broadcast re-scan for the tail counts; this version's
    only data-sized work is the sketch's single map-side-combined
    groupBy, and everything after runs on the bounded bucket table.
    The price is grid granularity: ``p_lo``/``p_hi`` are bucket
    LOWER bounds (integers — the caller's measure domain, e.g.
    cents), within 2^-p relative of the exact rank statistic (band
    pinned in tests), and the tail counts are exact FOR THOSE
    bounds: ``n_below`` counts values in buckets strictly below the
    picked bucket (all < p_lo), ``n_above`` values in buckets
    strictly above the p_hi bucket (all >= its upper edge). Every
    quantity is integer arithmetic — bit-identical cross-engine, so
    the q146 oracle replays it exactly. Because the sketch is the
    input, the same report maintains incrementally via
    ``refresh_additive_agg`` — winsorize bounds as a live MV, which
    the exact version cannot do (a percentile is not additive)."""
    from dataflow_python_etl_spark.operators.sketches import (
        QSK_PRECISION,
        quantile_sketch,
    )

    p = QSK_PRECISION if precision_bits is None else int(precision_bits)
    gb = list(group_cols or [])
    sk = quantile_sketch(df, value_col, gb, p)
    return winsorize_from_sketch(sk, gb, lower_ppm, upper_ppm, p)


def winsorize_from_sketch(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    lower_ppm: int = 50_000,
    upper_ppm: int = 950_000,
    precision_bits: int | None = None,
) -> DataFrame:
    """The report half of :func:`winsorize_bounds_by_sketch`, taking
    a PREBUILT ``(group…, bucket, cnt)`` sketch — e.g. the persisted
    MV that ``refresh_additive_agg`` maintains — so refreshed clip
    bounds are readable without touching fact history (pinned)."""
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.sketches import (
        QSK_PRECISION,
        quantile_bucket_lo,
    )

    p = QSK_PRECISION if precision_bits is None else int(precision_bits)
    if not 0 < lower_ppm < upper_ppm <= 1_000_000:
        raise ValueError(
            f"need 0 < lower_ppm < upper_ppm <= 1e6, got {lower_ppm}/{upper_ppm}"
        )
    gb = list(group_cols or [])
    sk = sketch
    w_cum = (
        Window.partitionBy(*gb)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = sk.select(
        *gb,
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*gb)).alias("n_total"),
    )

    def pick(q_ppm: int, names: tuple[str, str], above: bool):
        rank = F.expr(f"(n_total * {int(q_ppm)} + 999999) div 1000000")
        hit = c.where((F.col("cum") >= rank) & (F.col("cum") - F.col("cnt") < rank))
        tail = (
            (F.col("n_total") - F.col("cum"))
            if above
            else (F.col("cum") - F.col("cnt"))
        )
        return hit.select(
            *gb,
            quantile_bucket_lo(F.col("bucket"), p).alias(names[0]),
            tail.alias(names[1]),
            "n_total",
        )

    lo = pick(lower_ppm, ("p_lo", "n_below"), above=False)
    hi = pick(upper_ppm, ("p_hi", "n_above"), above=True).drop("n_total")
    joined = lo.join(hi, gb) if gb else lo.crossJoin(hi)
    return joined.select(*gb, "p_lo", "p_hi", "n_below", "n_above", "n_total")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    n_sigmas: float = 3.0,
    decimals: int = 2,
) -> DataFrame:
    """Robust outlier report via the median absolute deviation —
    ``(group?, n, med_units, mad_units, n_outliers)`` where a row is
    an outlier when ``|v − median| > n_sigmas · 1.4826 · MAD``. The
    MAD·1.4826 estimator is the standard robust stand-in for σ: unlike
    the mean/stddev z-score (q78), a single pathological value cannot
    drag the threshold, which is the point of an outlier CHECK.

    Cross-engine determinism by construction: values lift to exact
    integer units (``round(v · 10^decimals)`` — the 2-decimal grid),
    so both medians are exact doubles on the ¼-unit grid (an even-count
    median averages two integers; a deviation median averages two
    half-grid points), the threshold is ONE IEEE multiply of that
    exact double, and the tail count compares exact doubles — no
    accumulated float anywhere, same discipline as
    :func:`winsorize_bounds`. Reported med/mad stay in integer units.

    Same two-aggregations-over-one-scan shape as winsorize_bounds, with
    a second pass for the deviation median (MAD is a median OF a
    median-residual — inherently two passes): per-group medians
    broadcast back, never a global sort. ``percentile`` buffers
    per-group distinct values — bounded here by the value DOMAIN
    (integer units of a bounded measure), the documented contract.
    """
    scale = 10 ** decimals
    keys = [group_col] if group_col else []
    v = df.select(
        *keys, F.round(F.col(value_col) * scale).cast("long").alias("v")
    )
    med = v.groupBy(*keys).agg(F.percentile("v", F.lit(0.5)).alias("med_units"))
    j1 = v.join(F.broadcast(med), keys) if keys else v.crossJoin(F.broadcast(med))
    dev = j1.select(*keys, "med_units", F.abs(F.col("v") - F.col("med_units")).alias("dev"))
    mad = dev.groupBy(*keys, "med_units").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile("dev", F.lit(0.5)).alias("mad_units"),
    )
    j2 = (
        dev.join(F.broadcast(mad), [*keys, "med_units"])
        if keys
        else dev.crossJoin(F.broadcast(mad.select("n", "mad_units")))
    )
    return j2.groupBy(*keys, "n", "med_units", "mad_units").agg(
        F.sum(
            (F.col("dev") > F.lit(n_sigmas) * F.lit(1.4826) * F.col("mad_units"))
            .cast("long")
        ).alias("n_outliers")
    ).select(*keys, "n", "med_units", "mad_units", "n_outliers")


def referential_integrity(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table foreign-key expectations: for each ``(name, child,
    child_key, parent, parent_key)`` relation, one row ``(relation,
    n_rows, n_orphans)`` — the Deequ-style referential check a star
    schema needs before any join-based pipeline trusts its output
    (an orphan fact row silently vanishes from every inner join
    downstream).

    Per relation: project the child to its key, LEFT join the
    parent's DISTINCT keys, count rows and parent-misses in ONE
    aggregate — the child is scanned once with only the key column
    read (pushdown prunes the rest). The join is declared
    declaratively so AQE broadcasts dimension key sets that fit and
    falls back to a shuffled join for dimension tables that don't —
    the right plan at both test scale and 100 TB. NULL child keys
    count as orphans (a NULL FK fails the integrity expectation; use
    ``completeness`` to distinguish missing-vs-dangling).
    """
    if not relations:
        raise ValueError("referential_integrity needs at least one relation")
    outs = []
    for name, child, child_key, parent, parent_key in relations:
        pk = parent.select(F.col(parent_key).alias("__pk")).distinct()
        joined = child.select(F.col(child_key).alias("__ck")).join(
            pk, F.col("__ck") == F.col("__pk"), "left"
        )
        outs.append(
            joined.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.col("__pk").isNull().cast("long")), F.lit(0)
                )
                .cast("long")
                .alias("n_orphans"),
            ).select(F.lit(name).alias("relation"), "n_rows", "n_orphans")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation: one summary row ``(n_added,
    n_removed, n_changed, n_unchanged)`` between two keyed snapshots
    — the "what did this refresh actually do" check that catches a
    feed replaying yesterday (0 added), truncating (mass removed), or
    silently rewriting history (mass changed) before downstream
    consumers trust the new snapshot.

    One FULL OUTER join on the key; change detection compares the
    ``compare_cols`` as STRUCTS (null-safe — a NULL→value transition
    counts as changed, matching intuition and DuckDB's ``IS DISTINCT
    FROM``). Callers pass EXACT-typed compare columns (ints, strings,
    cents-lifted money) — comparing raw floats across engines or
    formatting them into hashed strings is exactly the cross-engine
    trap the repo's float rules exist to avoid. Cost: one key
    shuffle; the output is 1 row.

    Snapshots must be KEYED (unique non-null key per row): a
    duplicated key would fan out the full-outer join and silently
    inflate every count, so both sides run through the repo's
    duplicate-key guard (window count + raise_error on the SAME key
    partitioning the join needs — no extra exchange). Duplicate
    NULL-key rows can't match anything and count as one added plus
    one removed each.
    """
    from dataflow_python_etl_spark.operators.upsert import (
        _guard_duplicate_source_keys,
    )

    if not key_cols:
        raise ValueError("table_diff requires key_cols")
    if not compare_cols:
        raise ValueError("table_diff requires compare_cols")
    old = _guard_duplicate_source_keys(old, key_cols, "table_diff(old)")
    new = _guard_duplicate_source_keys(new, key_cols, "table_diff(new)")
    o = old.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(key_cols)],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__ov"),
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(key_cols)],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__nv"),
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, [f"__k{i}" for i in range(len(key_cols))], "full_outer")
    added = F.col("__in_old").isNull()
    removed = F.col("__in_new").isNull()
    changed = (
        F.col("__in_old").isNotNull()
        & F.col("__in_new").isNotNull()
        & ~F.col("__ov").eqNullSafe(F.col("__nv"))
    )
    unchanged = (
        F.col("__in_old").isNotNull()
        & F.col("__in_new").isNotNull()
        & F.col("__ov").eqNullSafe(F.col("__nv"))
    )
    return j.agg(
        F.coalesce(F.sum(added.cast("long")), F.lit(0)).cast("long").alias("n_added"),
        F.coalesce(F.sum(removed.cast("long")), F.lit(0)).cast("long").alias("n_removed"),
        F.coalesce(F.sum(changed.cast("long")), F.lit(0)).cast("long").alias("n_changed"),
        F.coalesce(F.sum(unchanged.cast("long")), F.lit(0))
        .cast("long")
        .alias("n_unchanged"),
    )


def freshness_check(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    max_lag_s: int = 259_200,
    window_s: int = 604_800,
) -> DataFrame:
    """Feed freshness + volume expectation, per group: ``(grp, lag_s,
    n_recent, n_prior, volume_ratio_ppm, stale)`` — how long since
    the group last produced an event, its event volume in the most
    recent ``window_s`` vs the window before, and a stale flag when
    the lag exceeds ``max_lag_s``. The "did the feed die or quietly
    halve" gate that runs before anyone trusts a daily refresh.

    The reference instant is the CORPUS max timestamp (deterministic
    and replayable — wall-clock "now" would make the expectation
    unreproducible); it broadcasts as a 1-row frame onto the one
    group-keyed aggregate, so the fact table is scanned once for the
    stats plus one column-pruned scan for the max. All arithmetic is
    exact-µs integer (`div`, the q101 rule); the volume ratio is
    positive-operand integer ppm, NULL when the prior window is
    empty (a new feed is not "infinitely grown")."""
    if max_lag_s <= 0 or window_s <= 0:
        raise ValueError("max_lag_s and window_s must be > 0")
    now = events.agg(F.max(ts_col).alias("__now"))
    us = F.unix_micros(F.col(ts_col))
    now_us = F.unix_micros(F.col("__now"))
    w_us = window_s * 1_000_000
    per = (
        events.join(F.broadcast(now))
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.max(us).alias("__last_us"),
            F.max(now_us).alias("__now_us"),
            F.sum(F.when(us > now_us - w_us, 1).otherwise(0))
            .cast("long")
            .alias("n_recent"),
            F.sum(
                F.when((us <= now_us - w_us) & (us > now_us - 2 * w_us), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_prior"),
        )
    )
    return per.select(
        "grp",
        F.expr("(__now_us - __last_us) div 1000000").alias("lag_s"),
        "n_recent",
        "n_prior",
        F.when(F.col("n_prior") == 0, F.lit(None).cast("long")).otherwise(
            F.expr("(n_recent * 1000000) div n_prior")
        ).alias("volume_ratio_ppm"),
        (F.expr("(__now_us - __last_us) div 1000000") > max_lag_s)
        .cast("int")
        .alias("stale"),
    )


# log10(1 + 1/d) for d = 1..9, in half-up micro-units. HARDCODED on
# both engines (the oracle embeds the same literals) because log10 is
# engine-private at the last ulp — the repo's ln/HLL rule. The nine
# values sum to exactly 10⁶.
BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def benford_deviation(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column —
    the classic fabricated-data / broken-feed screen (Newcomb 1881,
    Benford 1938; used by auditors exactly this way). One row per
    digit 1–9: observed count, observed frequency and the Benford
    expectation in micro-units, and the absolute deviation
    ``dev_micro`` (the max over digits is the L∞ test statistic;
    readers threshold it per use case).

    ALL-INTEGER: values are lifted to cents (2-decimal data, exact),
    the leading digit is the first character of the INTEGER's decimal
    string (cross-engine safe — no float formatting), observed
    frequency is one half-up integer division to micro-units, and the
    expected frequencies are hardcoded literals on both engines since
    ``log10`` is engine-private at the last ulp. Non-positive values
    are excluded (Benford is defined on positive magnitudes).

    Scale shape: a 9-bucket map-side-combined count — one fact scan,
    one 9-row exchange; the digit spine is built driver-side so every
    digit reports even at zero observations."""
    from dataflow_python_etl_spark.operators.sketches import _int_div

    cents = F.round(F.col(value_col) * 100).cast("long")
    counts = (
        df.select(cents.alias("c"))
        .where(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(d + 1, BENFORD_MICRO[d]) for d in range(9)],
        "digit int, expected_micro long",
    )
    filled = spine.join(counts, "digit", "left").select(
        "digit",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        "expected_micro",
    )
    from pyspark.sql import Window

    total = F.sum("n").over(Window.partitionBy(F.lit(1)))
    obs = F.when(
        total > 0, _int_div(F.lit(2_000_000) * F.col("n") + total, F.lit(2) * total)
    ).otherwise(F.lit(0))
    return (
        filled.withColumn("obs_micro", obs.cast("long"))
        .select(
            "digit",
            "n",
            "obs_micro",
            "expected_micro",
            F.abs(F.col("obs_micro") - F.col("expected_micro")).alias("dev_micro"),
        )
    )
