"""Funnel (q74) and cohort-retention (q75) semantics on crafted
event streams."""

import datetime as dt

import pytest

from dataflow_python_etl_spark.operators.events import (
    funnel_report,
    funnel_steps_per_user,
    retention_matrix,
)
from dataflow_python_etl_spark.plans.checks import explain_str
from dataflow_python_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
STEPS = ("signup", "click", "purchase")


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_ordered_progression(spark):
    events = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (1, 1, 0, "signup"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
            # user 2: purchase BEFORE click -> stops at step 1 then 2
            (2, 1, 0, "signup"), (2, 1, 1, "purchase"), (2, 1, 2, "click"),
            # user 3: never signed up -> 0 even with later steps
            (3, 1, 0, "click"), (3, 1, 1, "purchase"),
            # user 4: signup only
            (4, 1, 5, "signup"),
        ],
    )
    got = {
        r.user: r.steps_completed
        for r in funnel_steps_per_user(events, STEPS).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 1}


def test_funnel_requires_strictly_later_events(spark):
    # click at the SAME timestamp as signup must not advance the funnel
    events = _ev(spark, [(1, 1, 0, "signup"), (1, 1, 0, "click")])
    got = funnel_steps_per_user(events, STEPS).collect()[0]
    assert got.steps_completed == 1
    # a later signup does not reopen the funnel for the earlier click
    events2 = _ev(spark, [(1, 1, 5, "signup"), (1, 1, 1, "click")])
    assert funnel_steps_per_user(events2, STEPS).collect()[0].steps_completed == 1


def test_funnel_report_keeps_empty_steps(spark):
    events = _ev(spark, [(1, 1, 0, "signup"), (2, 1, 0, "signup")])
    got = {r.step: (r.step_name, r.users) for r in funnel_report(events, STEPS).collect()}
    assert got == {1: ("signup", 2), 2: ("click", 0), 3: ("purchase", 0)}
    with pytest.raises(ValueError, match="non-empty"):
        funnel_report(events, ())


def test_retention_matrix_cohorts_and_offsets(spark):
    events = _ev(
        spark,
        [
            # cohort of Mon Jan 1: users 1, 2; user 1 returns weeks 1 and 2
            (1, 1, 0, "view"), (1, 9, 0, "view"), (1, 16, 0, "view"),
            (2, 3, 0, "view"),
            # cohort of Mon Jan 8: user 3, returns week 1
            (3, 8, 0, "view"), (3, 20, 0, "view"),
        ],
    )
    got = {
        (r.cohort.isoformat(), r.period_offset): r.users
        for r in retention_matrix(events).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }
    with pytest.raises(ValueError, match="period"):
        retention_matrix(events, period="hour")


def test_event_analytics_plans_stay_jvm(spark):
    for q in ("q74_funnel", "q75_retention"):
        df = QUERIES[q].fn(spark, SF_DIR)
        assert "EvalPython" not in explain_str(df), q


def test_funnel_conversion_window(spark):
    from dataflow_python_etl_spark.operators.events import funnel_steps_per_user

    # click 2 days after signup: inside a 7-day window, outside 1-day
    events = _ev(
        spark,
        [(1, 1, 0, "signup"), (1, 3, 0, "click"), (1, 4, 0, "purchase")],
    )
    assert (
        funnel_steps_per_user(events, STEPS, conversion_window_days=7)
        .collect()[0]
        .steps_completed
        == 3
    )
    assert (
        funnel_steps_per_user(events, STEPS, conversion_window_days=1)
        .collect()[0]
        .steps_completed
        == 1
    )
    # window anchors at step 1: purchase 6 days after signup passes a
    # 7-day window even though it is 4 days after the click
    events2 = _ev(
        spark,
        [(1, 1, 0, "signup"), (1, 3, 0, "click"), (1, 7, 0, "purchase")],
    )
    assert (
        funnel_steps_per_user(events2, STEPS, conversion_window_days=7)
        .collect()[0]
        .steps_completed
        == 3
    )
    # ...but fails a 5-day window (purchase at day 6 > 5)
    assert (
        funnel_steps_per_user(events2, STEPS, conversion_window_days=5)
        .collect()[0]
        .steps_completed
        == 2
    )


def test_scd2_intervals_collapse_and_close(spark):
    from dataflow_python_etl_spark.operators.events import scd2_intervals

    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 10, "free"),
            (1, dt.datetime(2024, 1, 2), 11, "free"),   # same value: collapses
            (1, dt.datetime(2024, 1, 3), 12, "pro"),
            (1, dt.datetime(2024, 1, 5), 13, "free"),   # value can recur
            (2, dt.datetime(2024, 1, 4), 14, "pro"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    rows = sorted(
        (r.user_id, r.value, r.valid_from.day,
         r.valid_to.day if r.valid_to else None, r.is_current)
        for r in scd2_intervals(events).collect()
    )
    assert rows == [
        (1, "free", 1, 3, False),
        (1, "free", 5, None, True),
        (1, "pro", 3, 5, False),
        (2, "pro", 4, None, True),
    ]
    # exactly one open (current) interval per entity
    assert sum(1 for r in rows if r[4]) == 2


def test_funnel_report_empty_events_keeps_all_steps(spark):
    from dataflow_python_etl_spark.operators.events import funnel_report

    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    got = {r.step: (r.step_name, r.users) for r in funnel_report(empty, STEPS).collect()}
    assert got == {1: ("signup", 0), 2: ("click", 0), 3: ("purchase", 0)}


def test_funnel_cap_keeps_earliest_and_bounds_bot_user(spark):
    """max_events_per_user: (a) semantics — results equal the uncapped
    funnel over the pre-truncated (earliest-N by (ts, type)) stream;
    (b) skew — a planted 1e5-event bot user never materializes an
    array larger than the cap (the rank filter runs BEFORE the
    collect); (c) plan — still ONE user-keyed shuffle."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = []
    # bot user 1: 100k events, all 'view' after an initial signup/click
    rows.append((1, dt.datetime(2024, 1, 1, 0), "signup"))
    rows.append((1, dt.datetime(2024, 1, 1, 1), "click"))
    for i in range(100_000):
        rows.append((1, dt.datetime(2024, 1, 2) + dt.timedelta(seconds=i), "view"))
    # the bot's purchase lands AFTER the cap window — a capped funnel
    # must NOT credit it (bounded-compute approximation, documented)
    rows.append((1, dt.datetime(2024, 3, 1), "purchase"))
    # normal users
    for u in range(2, 30):
        t0 = dt.datetime(2024, 1, 1, u % 24)
        seq = ["signup", "click", "purchase"] if u % 3 else ["signup", "view"]
        for k, t in enumerate(seq):
            rows.append((u, t0 + dt.timedelta(hours=k), t))
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )

    cap = 50
    capped = funnel_steps_per_user(events, STEPS, max_events_per_user=cap)
    # (a) equivalence against pre-truncated input
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    trunc = (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .drop("rn")
    )
    expect = {
        r["user"]: r["steps_completed"]
        for r in funnel_steps_per_user(trunc, STEPS).collect()
    }
    got = {r["user"]: r["steps_completed"] for r in capped.collect()}
    assert got == expect
    assert got[1] == 2  # bot's late purchase is beyond the cap
    assert got[2] == 3

    # (b) the collected arrays are bounded by the cap for EVERY user:
    # rebuild the capped pre-collect stream and assert its max
    # per-user cardinality
    max_per_user = (
        trunc.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_per_user == cap

    # (c) one exchange end-to-end (rank + collect share the user key),
    # checked on a fresh plan (a collected DF explains final+initial
    # AQE sections, double-counting). Bonus from Spark's optimizer:
    # the rank filter plans as a PARTIAL WindowGroupLimit — the bot's
    # events truncate to the cap per map partition BEFORE the
    # shuffle, so not even the exchange sees the 1e5-event stream.
    fresh = funnel_steps_per_user(events, STEPS, max_events_per_user=cap)
    from dataflow_python_etl_spark.plans.checks import count_exchanges

    s = explain_str(fresh, "simple")
    assert count_exchanges(fresh) == 1, s
    assert "EvalPython" not in s
    assert "WindowGroupLimit" in s and "Partial" in s, s


def test_event_transitions_cap_bounds_stream(spark):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import event_transitions

    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), f"e{i}", i)
            for i in range(100)]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = event_transitions(events, max_events_per_user=10)
    # 10 kept events -> 9 transitions, the earliest ones
    assert out.agg(F.sum("transitions")).collect()[0][0] == 9
    assert {r["from_type"] for r in out.collect()} == {f"e{i}" for i in range(9)}


def test_debounce_session_vs_strict_semantics(spark):
    """0s/30s/60s burst with a 45 s gap: session keeps only the first
    (each successor is <45 s from its PREDECESSOR); strict re-arms on
    the last KEPT event and recovers the 60 s one."""
    from dataflow_python_etl_spark.operators.events import debounce_events

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), "click", 1),
        (1, dt.datetime(2024, 1, 1, 0, 0, 30), "click", 2),
        (1, dt.datetime(2024, 1, 1, 0, 1, 0), "click", 3),
        (2, dt.datetime(2024, 1, 1, 0, 0, 0), "click", 4),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    sess = {r.event_id: r.kept for r in debounce_events(df, 45, mode="session").collect()}
    strict = {r.event_id: r.kept for r in debounce_events(df, 45, mode="strict").collect()}
    assert sess == {1: True, 2: False, 3: False, 4: True}
    assert strict == {1: True, 2: False, 3: True, 4: True}


def test_debounce_strict_matches_reference_on_random_streams(spark):
    import random

    from dataflow_python_etl_spark.operators.events import debounce_events

    rng = random.Random(7)
    rows, eid = [], 0
    for u in range(6):
        t = dt.datetime(2024, 1, 1)
        for _ in range(40):
            t += dt.timedelta(seconds=rng.randrange(1, 120))
            rows.append((u, t, "e", eid))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    got = {r.event_id: r.kept for r in debounce_events(df, 90, mode="strict").collect()}
    # reference: greedy chain per user in time order
    want = {}
    by_user = {}
    for u, t, _, i in rows:
        by_user.setdefault(u, []).append((t, i))
    for u, evs in by_user.items():
        last = None
        for t, i in sorted(evs):
            keep = last is None or (t - last).total_seconds() > 90
            want[i] = keep
            if keep:
                last = t
    assert got == want and sum(got.values()) < len(rows)


def test_winsorize_bounds_counts_and_validation(spark):
    import pytest as _pt

    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.expectations import winsorize_bounds

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    r = winsorize_bounds(df, "v", 0.10, 0.90).collect()[0]
    # p10 of 1..100 = 10.9, p90 = 90.1 (linear interpolation)
    assert (r.p_lo, r.p_hi) == (10.9, 90.1)
    assert (r.n_below, r.n_above, r.n_total) == (10, 10, 100)
    with _pt.raises(ValueError, match="lower"):
        winsorize_bounds(df, "v", 0.9, 0.1)


def test_scd2_apply_changes_incremental_equals_rebuild(spark):
    """THE invariant: apply(scd2(A), B) == scd2(A ∪ B) for in-order
    batches — collapse, multi-change chains, no-op repeats, and new
    entities all exercised; closed history untouched."""
    from dataflow_python_etl_spark.operators.events import (
        scd2_apply_changes,
        scd2_intervals,
    )

    schema = "user_id long, ts timestamp, event_id long, event_type string"
    a = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 10, "free"),
            (1, dt.datetime(2024, 1, 3), 11, "pro"),
            (2, dt.datetime(2024, 1, 2), 12, "free"),
            (3, dt.datetime(2024, 1, 4), 13, "pro"),
        ],
        schema,
    )
    b = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 5), 20, "pro"),    # no-op repeat
            (1, dt.datetime(2024, 1, 6), 21, "free"),   # change
            (1, dt.datetime(2024, 1, 7), 22, "trial"),  # chained change
            (2, dt.datetime(2024, 1, 8), 23, "pro"),    # change
            (9, dt.datetime(2024, 1, 9), 24, "free"),   # new entity
        ],
        schema,
    )
    key = lambda r: (r.user_id, r.value, r.valid_from, r.valid_to, r.is_current)  # noqa: E731
    got = sorted(map(key, scd2_apply_changes(scd2_intervals(a), b).collect()))
    want = sorted(map(key, scd2_intervals(a.unionByName(b)).collect()))
    assert got == want and len(got) == 8


def test_scd2_apply_changes_rejects_out_of_order(spark):
    from dataflow_python_etl_spark.operators.events import (
        scd2_apply_changes,
        scd2_intervals,
    )

    schema = "user_id long, ts timestamp, event_id long, event_type string"
    a = spark.createDataFrame([(1, dt.datetime(2024, 1, 5), 10, "free")], schema)
    stale = spark.createDataFrame([(1, dt.datetime(2024, 1, 2), 20, "pro")], schema)
    with pytest.raises(Exception, match="out-of-order"):
        scd2_apply_changes(scd2_intervals(a), stale).collect()


def test_peak_concurrency_overlap_and_boundary(spark):
    from dataflow_python_etl_spark.operators.events import peak_concurrency

    rows = [
        # Jan 1: A 00:00-00:02, B 00:01-00:03, and C starting 00:02
        # EXACTLY when A ends — closed-interval policy: all three are
        # active at the 00:02 instant, peak = 3
        (1, dt.datetime(2024, 1, 1, 0, 0), 1), (1, dt.datetime(2024, 1, 1, 0, 2), 2),
        (2, dt.datetime(2024, 1, 1, 0, 1), 3), (2, dt.datetime(2024, 1, 1, 0, 3), 4),
        (3, dt.datetime(2024, 1, 1, 0, 2), 5), (3, dt.datetime(2024, 1, 1, 0, 4), 6),
        # Jan 2: one user, two single-event sessions (gap > 300 s) —
        # start == end must still count itself -> peak 1
        (1, dt.datetime(2024, 1, 2, 0, 0), 7),
        (1, dt.datetime(2024, 1, 2, 1, 0), 8),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {r.day.isoformat(): r.peak_concurrent for r in peak_concurrency(df).collect()}
    assert got == {"2024-01-01": 3, "2024-01-02": 1}


# ---------------------------------------------------------------------------
# global_ntile / rfm_segments (q98)
# ---------------------------------------------------------------------------


def test_global_ntile_matches_builtin_ntile(spark):
    """Distributed range-rank NTILE ≡ Spark's own single-window ntile,
    including the n % b extra-row-to-early-buckets convention and
    n < b (each row its own bucket)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import global_ntile

    rows = [(i, (i * 37) % 101) for i in range(103)]
    df = spark.createDataFrame(rows, "id long, score long")
    for b in (3, 5, 7):
        got = {
            r["id"]: r["bucket"]
            for r in global_ntile(
                df, b, [("score", "desc"), ("id", "asc")], "bucket", partitions=8
            ).collect()
        }
        want = {
            r["id"]: r["bucket"]
            for r in df.select(
                "id",
                F.ntile(b)
                .over(Window.orderBy(F.col("score").desc(), F.col("id")))
                .alias("bucket"),
            ).collect()
        }
        assert got == want, f"b={b}"
    tiny = spark.createDataFrame(rows[:4], "id long, score long")
    got = {
        r["id"]: r["bucket"]
        for r in global_ntile(
            tiny, 7, [("score", "asc"), ("id", "asc")], "bucket"
        ).collect()
    }
    assert sorted(got.values()) == [1, 2, 3, 4]


def test_global_ntile_single_range_exchange(spark):
    """The sizes branch and the ranked branch must SHARE one
    rangepartitioning exchange (registered cache + ReuseExchange) —
    two independent range samples would be seeded differently and
    could disagree on partition boundaries."""
    import re

    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import global_ntile
    from dataflow_python_etl_spark.plans.checks import explain_str

    df = spark.range(1000).withColumn("score", (F.col("id") * 7) % 97)
    out = global_ntile(df, 5, [("score", "asc"), ("id", "asc")], "b")
    s = explain_str(out, mode="simple")
    # the explain prints the cache's build plan under BOTH
    # InMemoryTableScans, so count DISTINCT physical nodes by plan_id:
    # one range exchange, materialized once, read by both branches
    ids = set(re.findall(r"Exchange rangepartitioning.*plan_id=(\d+)", s))
    assert len(ids) == 1, s
    assert s.count("InMemoryTableScan") == 2, s
    # ranks come from monotonically_increasing_id post-sort, NOT a
    # pid-partitioned row_number window — that window's
    # ClusteredDistribution(_pid) requirement would silently add a
    # SECOND data-sized hash exchange (the offsets frame's tiny sum
    # window over `partitions` rows is the only Window allowed)
    assert "row_number" not in s, s


def test_rfm_segments_partition_of_base(spark):
    """Every entity lands in exactly one r-f-m cell; scores span
    1..n_buckets; monetary totals reconcile with the raw sum."""
    from dataflow_python_etl_spark.operators.events import rfm_segments
    from dataflow_python_etl_spark.sources.catalog import read_table

    orders = read_table(spark, SF_DIR, "orders")
    seg = rfm_segments(
        orders, entity_col="o_custkey", ts_col="o_orderdate",
        amount_col="o_totalprice",
    ).collect()
    n_entities = orders.select("o_custkey").distinct().count()
    assert sum(r["n_entities"] for r in seg) == n_entities
    assert len(seg) <= 125
    for r in seg:
        a, b, c = (int(x) for x in r["segment"].split("-"))
        assert all(1 <= v <= 5 for v in (a, b, c))


# ---------------------------------------------------------------------------
# conversion_lag (q101)
# ---------------------------------------------------------------------------


def test_conversion_lag_ordered_and_bucketed(spark):
    """Only step_to events STRICTLY after the first step_from count;
    lag buckets at integer-divided hours; non-converts dropped."""
    from dataflow_python_etl_spark.operators.events import conversion_lag

    events = _ev(
        spark,
        [
            (1, 1, 0, "signup"), (1, 1, 1, "purchase"),   # lag 1h -> bucket 1
            (2, 1, 5, "purchase"), (2, 1, 6, "signup"),   # out of order: no convert
            (3, 1, 0, "signup"), (3, 2, 0, "purchase"),   # 24h -> bucket 24
            (4, 1, 0, "signup"),                          # never converts
            (5, 1, 0, "purchase"), (5, 1, 1, "signup"), (5, 1, 3, "purchase"),
            # user 5: first signup at 1h, first later purchase 3h -> bucket 2
        ],
    )
    got = {
        r["lag_bucket"]: r["n_users"]
        for r in conversion_lag(events, "signup", "purchase").collect()
    }
    assert got == {1: 1, 24: 1, 2: 1}


def test_conversion_lag_single_exchange(spark):
    """The window min and the per-user agg share one user-keyed
    exchange."""
    from dataflow_python_etl_spark.operators.events import conversion_lag
    from dataflow_python_etl_spark.plans.checks import count_exchanges
    from dataflow_python_etl_spark.sources.catalog import read_table

    out = conversion_lag(
        read_table(spark, SF_DIR, "events"), "signup", "purchase"
    )
    # user-keyed exchange + the final bucket agg exchange only
    assert count_exchanges(out) == 2


def test_value_deciles_partition_of_rows(spark):
    """q105: deciles partition all rows; depths differ by at most one
    and earlier deciles get the extra row; decile value ranges are
    non-overlapping and ordered."""
    from dataflow_python_etl_spark.queries import QUERIES

    rows = sorted(
        (r["decile"], r["n"], r["lo_cents"], r["hi_cents"])
        for r in QUERIES["q105_value_deciles"].fn(spark, SF_DIR).collect()
    )
    assert [d for d, *_ in rows] == list(range(1, 11))
    depths = [n for _, n, *_ in rows]
    assert max(depths) - min(depths) <= 1
    assert depths == sorted(depths, reverse=True)
    for (_, _, _, hi_prev), (_, _, lo_next, _) in zip(rows, rows[1:]):
        assert hi_prev <= lo_next


def test_revenue_pareto_monotone_and_complete(spark):
    """q106: shares are non-decreasing in decile, final share is
    exactly 1e6 ppm, and cum_cents reconciles with decile_cents."""
    from dataflow_python_etl_spark.queries import QUERIES

    rows = sorted(
        (r["decile"], r["n_customers"], r["decile_cents"], r["cum_cents"],
         r["share_ppm"])
        for r in QUERIES["q106_revenue_pareto"].fn(spark, SF_DIR).collect()
    )
    assert [d for d, *_ in rows] == list(range(1, 11))
    shares = [s for *_, s in rows]
    assert shares == sorted(shares) and shares[-1] == 1_000_000
    # best decile carries strictly more than its population share
    assert shares[0] > 100_000
    running = 0
    for _, _, dc, cc, _ in rows:
        running += dc
        assert cc == running


def test_inter_event_cadence_buckets_and_clamp(spark):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import inter_event_cadence

    rows = [
        # user 1: gaps of 30s (bucket 0), 90s (bucket 1), 2h (clamped)
        (1, "2024-01-01 00:00:00", "a", 1),
        (2, "2024-01-01 00:00:30", "b", 1),
        (3, "2024-01-01 00:02:00", "b", 1),
        (4, "2024-01-01 02:02:00", "c", 1),
        # user 2: single event → no gap
        (5, "2024-01-01 00:00:00", "a", 2),
    ]
    ev = spark.createDataFrame(
        rows, "event_id: long, ts_s: string, event_type: string, user_id: long"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type", "user_id")
    got = {(r["grp"], r["bucket"]): r["n_gaps"]
           for r in inter_event_cadence(ev, 60, 60).collect()}
    assert got == {("b", 0): 1, ("b", 1): 1, ("c", 60): 1}
    with pytest.raises(ValueError, match="must be > 0"):
        inter_event_cadence(ev, 0)


def test_multitouch_attribution_credit_algebra(spark):
    """Planted journeys: remainder to earliest touch, 'none' for
    touch-less conversions, post-conversion touches credit nothing."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import attribution_multitouch

    rows = [
        # user 1: a, b, c then purchase → k=3: each 333333, 'a' +1 remainder
        (1, "2024-01-01 00:00:00", "a", 1),
        (2, "2024-01-01 00:01:00", "b", 1),
        (3, "2024-01-01 00:02:00", "c", 1),
        (4, "2024-01-01 00:03:00", "purchase", 1),
        # user 1 second journey: only b → full 1e6 to b
        (5, "2024-01-01 00:04:00", "b", 1),
        (6, "2024-01-01 00:05:00", "purchase", 1),
        # user 1: trailing touch, no conversion after → zero credit
        (7, "2024-01-01 00:06:00", "a", 1),
        # user 2: conversion with no touches → 'none'
        (8, "2024-01-01 00:00:00", "purchase", 2),
    ]
    ev = spark.createDataFrame(
        rows, "event_id: long, ts_s: string, event_type: string, user_id: long"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type", "user_id")
    got = {r["touch_type"]: r["credit_ppm"]
           for r in attribution_multitouch(ev).collect()}
    assert got == {
        "a": 333_334,  # 333333 + remainder 1 (earliest touch)
        "b": 333_333 + 1_000_000,
        "c": 333_333,
        "none": 1_000_000,
    }
    assert sum(got.values()) == 3 * 1_000_000  # exact conservation


def test_multitouch_attribution_conservation_on_events(spark):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import attribution_multitouch
    from dataflow_python_etl_spark.sources.catalog import read_table

    ev = read_table(spark, SF_DIR, "events")
    n_conv = ev.where(F.col("event_type") == "purchase").count()
    total = (
        attribution_multitouch(ev)
        .agg(F.sum("credit_ppm").alias("s"))
        .first()["s"]
    )
    assert total == n_conv * 1_000_000


def test_stickiness_semantics_and_broadcast_spine(spark):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import active_user_stickiness
    from dataflow_python_etl_spark.plans.checks import has_broadcast_join

    rows = [
        # day 1: users 1,2; day 2: user 1; day 9 (outside window of 1-2): user 3
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 11:00:00", 2),
        (3, "2024-01-02 10:00:00", 1),
        (4, "2024-01-02 10:30:00", 1),  # dup user-day collapses
        (5, "2024-01-09 10:00:00", 3),
    ]
    ev = spark.createDataFrame(
        rows, "event_id: long, ts_s: string, user_id: long"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    out = active_user_stickiness(ev)
    assert has_broadcast_join(out)
    got = {str(r["day"]): r for r in out.collect()}
    assert got["2024-01-01"]["dau"] == 2 and got["2024-01-01"]["wau"] == 2
    d2 = got["2024-01-02"]
    assert d2["dau"] == 1 and d2["wau"] == 2  # window [Dec 27..Jan 2]
    assert d2["stickiness_ppm"] == 500_000
    # Jan 9 window [Jan 3..9]: only user 3 — Jan 1-2 activity aged out
    assert got["2024-01-09"]["wau"] == 1
    import pytest

    with pytest.raises(ValueError, match="window_days"):
        active_user_stickiness(ev, 0)


def test_timedecay_attribution_weights_and_conservation(spark):
    """Crafted journey: touches 0, 1, and 2 days before conversion
    get weights 2³⁰/2²⁹/2²⁸ (4:2:1); credits are (10⁶·w) div Σw with
    the remainder to the NEAREST touch; total credit is exactly
    n_conversions·10⁶; orphan conversions credit 'none'."""
    import datetime as dt

    from dataflow_python_etl_spark.operators.events import attribution_timedecay

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # user 1: ad (2d before), email (1d), click (0d), then purchase
        (1, base - dt.timedelta(days=2), 1, "ad"),
        (1, base - dt.timedelta(days=1), 2, "email"),
        (1, base, 3, "click"),
        (1, base + dt.timedelta(seconds=1), 4, "purchase"),
        # user 2: conversion with no touches -> 'none'
        (2, base, 5, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        r["touch_type"]: r["credit_ppm"]
        for r in attribution_timedecay(ev).collect()
    }
    # weights 4:2:1 (sum 7): base credits 571428/285714/142857,
    # remainder 10^6 - 999999 = 1 goes to the nearest (click)
    assert got["click"] == 571428 + 1
    assert got["email"] == 285714
    assert got["ad"] == 142857
    assert got["none"] == 1_000_000
    assert sum(got.values()) == 2 * 1_000_000
    import pytest

    with pytest.raises(ValueError, match="halflife_days"):
        attribution_timedecay(ev, halflife_days=0)


def test_growth_accounting_ledger(spark):
    """Crafted 4-week ledger: u1 new→retained→(churn)→resurrected,
    u2 new→(churn), u3 new in the last week. Week 3 has NO activity
    but books u1's churn (the ledger-entry explode path); u3's churn
    would land past the horizon and must be clipped."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import growth_accounting

    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-03 11:00:00", 1),  # same week dedups
        (3, "2024-01-02 09:00:00", 2),
        (4, "2024-01-08 10:00:00", 1),  # u1 retained wk2
        (5, "2024-01-22 10:00:00", 1),  # u1 resurrected wk4 (skipped wk3)
        (6, "2024-01-24 10:00:00", 3),  # u3 new wk4
    ]
    ev = spark.createDataFrame(
        rows, "event_id: long, ts_s: string, user_id: long"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    got = {str(r["week"]): r for r in growth_accounting(ev).collect()}
    assert set(got) == {"2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22"}
    w1, w2, w3, w4 = (got[k] for k in sorted(got))
    assert (w1["new_users"], w1["retained_users"], w1["resurrected_users"], w1["churned_users"]) == (2, 0, 0, 0)
    assert (w2["new_users"], w2["retained_users"], w2["churned_users"]) == (0, 1, 1)  # u2 churns
    assert (w3["new_users"], w3["retained_users"], w3["resurrected_users"], w3["churned_users"]) == (0, 0, 0, 1)  # u1 lapse books here
    assert (w4["new_users"], w4["resurrected_users"], w4["churned_users"]) == (1, 1, 0)
    # reconciliation: actives(wk) = actives(wk-1) + new + resurrected - churned(wk)... using ledger identity
    # actives per week from the ledger: new + retained + resurrected
    actives = {k: r["new_users"] + r["retained_users"] + r["resurrected_users"] for k, r in got.items()}
    assert actives == {"2024-01-01": 2, "2024-01-08": 1, "2024-01-15": 0, "2024-01-22": 2}


def test_top_paths_semantics(spark):
    """Crafted streams: u1 a,b,c,d (path caps at 3 steps), u2 a,b,c
    with a same-ts tie broken by event_id, u3 single event."""
    import pytest
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.events import top_paths

    rows = [
        (1, "2024-01-01 10:00:00", 1, "a"),
        (2, "2024-01-01 10:01:00", 1, "b"),
        (3, "2024-01-01 10:02:00", 1, "c"),
        (4, "2024-01-01 10:03:00", 1, "d"),  # 4th event ignored
        (6, "2024-01-01 09:00:00", 2, "a"),
        (7, "2024-01-01 09:30:00", 2, "b"),  # same ts as 8: id order
        (8, "2024-01-01 09:30:00", 2, "c"),
        (9, "2024-01-01 08:00:00", 3, "x"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id: long, ts_s: string, user_id: long, event_type: string"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type")
    got = {r["path"]: r["n_users"] for r in top_paths(ev).collect()}
    assert got == {"a > b > c": 2, "x": 1}
    with pytest.raises(ValueError, match="n_steps"):
        top_paths(ev, n_steps=0)
    with pytest.raises(ValueError, match="top_k"):
        top_paths(ev, top_k=0)


def test_global_rank_and_gini_fixture(spark):
    """global_rank must equal row_number over the total order; the
    Gini construction on a crafted base: values 1,1,1,1 -> G=0;
    values 0,0,0,4 (one customer owns everything) -> G=(n-1)/n=3/4."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.operators.events import global_rank

    df = spark.createDataFrame(
        [(1, 30), (2, 10), (3, 20), (4, 10)], "id: long, v: long"
    )
    got = {
        r["id"]: r["rk"]
        for r in global_rank(df, [("v", "asc"), ("id", "asc")], "rk").collect()
    }
    assert got == {2: 1, 4: 2, 3: 3, 1: 4}
    unpersist_all()

    def gini_ppm(vals):
        rows = [(i + 1, v) for i, v in enumerate(vals)]
        d = spark.createDataFrame(rows, "o_custkey: long, cents: long")
        xs = sorted(vals)
        n, sx = len(xs), sum(xs)
        sxr = sum((i + 1) * x for i, x in enumerate(xs))
        num = 2 * sxr - (n + 1) * sx
        den = n * sx
        expect = (2_000_000 * num + den) // (2 * den)
        from dataflow_python_etl_spark.operators.sketches import _int_div, dec38

        k = global_rank(d, [("cents", "asc"), ("o_custkey", "asc")], "rk")
        s = k.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").alias("sx"),
            F.sum(dec38(F.col("rk")) * dec38(F.col("cents"))).alias("sxr"),
        )
        nn, sxc = dec38(F.col("n")), dec38(F.col("sx"))
        numc = dec38(F.lit(2)) * F.col("sxr") - (nn + dec38(F.lit(1))) * sxc
        denc = nn * sxc
        got = s.select(
            _int_div(dec38(F.lit(2_000_000)) * numc + denc, dec38(F.lit(2)) * denc)
            .cast("long")
            .alias("g")
        ).first()["g"]
        unpersist_all()
        assert got == expect
        return got

    assert gini_ppm([5, 5, 5, 5]) == 0
    assert gini_ppm([0, 0, 0, 4]) == 750_000  # (n-1)/n with n=4
