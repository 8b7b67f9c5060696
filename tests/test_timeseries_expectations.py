"""Time-series gap-fill rollup (q72) and data-quality expectations
(q73): crafted-fixture semantics plus the one-scan / no-Python plan
properties."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.expectations import (
    accepted_values,
    check_expectations,
    completeness,
    in_range,
    uniqueness,
)
from dataflow_python_etl_spark.operators.timeseries import time_bucket_gapfill
from dataflow_python_etl_spark.plans.checks import explain_str
from dataflow_python_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gapfill_dense_spine_and_locf(spark):
    events = spark.createDataFrame(
        [
            ("a", _ts(0, 10), 10.0),
            ("a", _ts(0, 50), 20.0),   # hour 0: avg 15
            ("a", _ts(3, 5), 7.0),     # hours 1-2 are gaps
            ("b", _ts(2, 0), 100.0),   # b starts at hour 2
        ],
        "event_type string, ts timestamp, value double",
    )
    out = time_bucket_gapfill(events).collect()
    rows = {(r.event_type, r.bucket_ts.hour): r for r in out}
    # dense spine: 2 groups x 4 hourly buckets over the global span
    assert len(out) == 8
    assert rows[("a", 0)].n_events == 2 and rows[("a", 0)].avg_value == 15.0
    # gaps: zero counts, locf carries hour 0's mean through hours 1-2
    for h in (1, 2):
        r = rows[("a", h)]
        assert r.n_events == 0 and r.avg_value is None and r.gap_filled
        assert r.value_locf == 15.0
    assert rows[("a", 3)].value_locf == 7.0 and not rows[("a", 3)].gap_filled
    # before b's first observation LOCF has nothing to carry
    assert rows[("b", 0)].value_locf is None and rows[("b", 0)].gap_filled
    assert rows[("b", 2)].value_locf == 100.0


def test_gapfill_no_python_in_plan(spark):
    df = QUERIES["q72_time_gapfill"].fn(spark, SF_DIR)
    assert "EvalPython" not in explain_str(df)


def test_expectations_observed_metrics(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0, "A"), (1, 2, 60.0, "A"), (2, 1, 20.0, "X"), (2, 1, None, None)],
        "k long, ln long, qty double, flag string",
    )
    out = {
        r.check: r
        for r in check_expectations(
            df,
            [
                completeness("qty", 1.0),
                uniqueness(["k", "ln"], 1.0),
                in_range("qty", 0, 50, threshold=0.5),
                accepted_values("flag", ("A",), threshold=0.5),
            ],
        ).collect()
    }
    assert out["completeness(qty)"].observed == 0.75
    assert not out["completeness(qty)"].passed
    # 3 distinct (k, ln) tuples over 4 rows
    assert out["uniqueness(k,ln)"].observed == 0.75
    # 2 of 4 in [0, 50] -> 0.5, passes at threshold 0.5
    r = out["in_range(qty,0,50)"]
    assert r.observed == 0.5 and r.passed
    assert out["accepted_values(flag)"].observed == 0.5


def test_expectations_validation():
    with pytest.raises(ValueError, match="non-empty"):
        check_expectations(None, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_expectations(None, [completeness("a"), completeness("a")])


def test_expectations_one_scan_no_python(spark):
    df = QUERIES["q73_data_quality"].fn(spark, SF_DIR)
    # simple mode prints the tree once ("formatted" repeats each node
    # in its detail section, double-counting the scan)
    s = explain_str(df, "simple")
    assert s.count("Scan parquet") == 1, "whole suite must cost ONE table scan"
    assert "EvalPython" not in explain_str(df)
    assert df.count() == 5


def test_expectations_empty_table_fails_not_nulls(spark):
    """An empty drop must FAIL the gate, not produce NULL verdicts
    that a where(passed = false) filter waves through."""
    df = spark.createDataFrame([], "k long, qty double")
    out = check_expectations(
        df, [completeness("qty"), uniqueness(["k"]), in_range("qty", 0, 1)]
    ).collect()
    assert len(out) == 3
    assert all(r.observed == 0.0 and r.passed is False for r in out)


def test_uniqueness_counts_null_component_tuples(spark):
    """STRUCT-tuple distinct: rows with NULL key components still
    count as values — DuckDB count(DISTINCT (a, b)) parity."""
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 1), (2, 2)], "a long, b long"
    )
    r = check_expectations(df, [uniqueness(["a", "b"])]).collect()[0]
    # distinct tuples: (1, NULL), (2, 1), (2, 2) -> 3/4
    assert r.observed == 0.75


def test_anomaly_moments_survive_int64_overflow_regime(spark):
    import datetime as dt

    from dataflow_python_etl_spark.operators.timeseries import rolling_anomalies

    # vi = 3e7 per event x 6 events x 20 trailing buckets: s1 ~ 3.6e9,
    # so the OLD integer s1*s1 (1.3e19) overflows int64 — the
    # double-numerator variance must stay finite and the spike must
    # still flag. (Per-event vi*vi stays integral: |vi| <= ~3e9 is the
    # documented loud domain bound.)
    rows = [
        ("m", dt.datetime(2024, 1, 1 + h // 24, h % 24, mi), 3.0e5 + (h % 2) + mi)
        for h in range(20)
        for mi in range(6)
    ]
    rows.append(("m", dt.datetime(2024, 1, 1, 20), 9.0e5))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r.bucket_ts.hour: r for r in rolling_anomalies(df, min_history=12).collect()}
    assert all(
        r.roll_std is None or r.roll_std >= 0.0 for r in out.values()
    )
    assert out[20].is_anomaly and out[20].roll_std > 0.0


def test_histogram_degenerate_constant_column_buckets_zero(spark):
    from dataflow_python_etl_spark.operators.timeseries import histogram

    # hi == lo: the width guard must branch to bucket 0, not divide
    # 0/0 (NaN, where DuckDB errors on the INT cast and Spark
    # silently buckets — ADVICE r5).
    df = spark.createDataFrame([(7.5,)] * 10, "x double")
    rows = histogram(df, "x").collect()
    assert len(rows) == 1
    assert rows[0].bucket == 0 and rows[0].n == 10 and rows[0].total == 75.0


def test_histogram_edges_and_top_bucket_close(spark):
    from dataflow_python_etl_spark.operators.timeseries import histogram

    # 0..20 over 4 buckets of width 5: the max value lands exactly on
    # the open top edge and must close into the last bucket.
    df = spark.createDataFrame([(float(i),) for i in range(21)], "x double")
    out = {r.bucket: r.n for r in histogram(df, "x", buckets=4).collect()}
    assert out == {0: 5, 1: 5, 2: 5, 3: 6}


def test_cusum_closed_form_equals_textbook_recursion(spark):
    """The window formulation S+ = P - min(0, running-min P) must equal
    the literal max(0, S + (x - mean)) recursion, computed here in
    exact fractions (deviations x·n − Σx, like the operator)."""
    import datetime as dt

    from dataflow_python_etl_spark.operators.timeseries import cusum_change_points

    # 30 quiet hours then a sustained doubling — a drift, not a spike
    counts = [2] * 30 + [5] * 18
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(("m", dt.datetime(2024, 1, 1 + h // 24, h % 24), float(eid), eid))
            eid += 1
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double, event_id long")
    got = sorted(
        cusum_change_points(df, threshold=5).collect(), key=lambda r: r.bucket_ts
    )
    n, tot = len(counts), sum(counts)
    s_pos = s_neg = 0
    for r, c in zip(got, counts):
        d = c * n - tot
        s_pos = max(0, s_pos + d)
        s_neg = max(0, s_neg - d)
        assert r.n_events == c
        assert r.cusum_pos == round(s_pos / n, 6), r
        assert r.cusum_neg == round(s_neg / n, 6), r
        assert r.alarm == (100 * s_pos > 5 * tot * n or 100 * s_neg > 5 * tot * n)
    # the sustained shift must eventually alarm; the quiet head must not
    assert not got[5].alarm and got[-1].alarm


# ---------------------------------------------------------------------------
# mad_outliers (q99)
# ---------------------------------------------------------------------------


def test_mad_outliers_planted_and_interpolated(spark):
    """A single pathological value is flagged without dragging the
    threshold (MAD=0 case), and even-count medians interpolate on the
    exact quarter-unit grid."""
    from dataflow_python_etl_spark.operators.expectations import mad_outliers

    rows = [("a", 10.00)] * 20 + [("a", 999.99)]
    rows += [("b", 1.00), ("b", 2.00), ("b", 3.00), ("b", 4.00)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in mad_outliers(df, "v", group_col="g").collect()}
    a = out["a"]
    assert (a["n"], a["med_units"], a["mad_units"], a["n_outliers"]) == (
        21, 1000.0, 0.0, 1,
    )
    b = out["b"]
    assert (b["n"], b["med_units"], b["mad_units"], b["n_outliers"]) == (
        4, 250.0, 100.0, 0,
    )


def test_mad_outliers_global_row(spark):
    from dataflow_python_etl_spark.operators.expectations import mad_outliers

    df = spark.createDataFrame([(float(i),) for i in range(1, 12)], "v double")
    row = mad_outliers(df, "v").collect()
    assert len(row) == 1
    assert row[0]["med_units"] == 600.0 and row[0]["mad_units"] == 300.0


# ---------------------------------------------------------------------------
# ewma_levels (q102)
# ---------------------------------------------------------------------------


def test_ewma_fold_matches_reference_chain(spark):
    """The ordered fold reproduces the exact IEEE chain (init = first
    bucket count), and a single-bucket series returns its count."""
    import datetime as dt

    from dataflow_python_etl_spark.operators.timeseries import ewma_levels

    rows = []
    for h, n in ((0, 1), (1, 2), (2, 3)):
        rows += [("a", dt.datetime(2024, 1, 1, h))] * n
    rows.append(("b", dt.datetime(2024, 1, 1, 5)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["grp"]: (r["n_buckets"], r["ewma"]) for r in ewma_levels(df).collect()}
    # python reference: s=1; s=0.2*2+0.8*s; s=0.2*3+0.8*s
    s = 1.0
    for x in (2.0, 3.0):
        s = 0.2 * x + 0.8 * s
    assert got["a"] == (3, round(s, 6))
    assert got["b"] == (1, 1.0)
    import pytest as _pt

    with _pt.raises(ValueError, match="alpha"):
        ewma_levels(df, alpha=1.0)


def test_seasonal_outliers_bucket_semantics(spark):
    """Planted weekly cycle: a value normal for bucket A is an
    outlier when it shows up in bucket B's quiet hour."""
    from dataflow_python_etl_spark.operators.timeseries import seasonal_outliers
    from dataflow_python_etl_spark.plans.checks import has_broadcast_join

    rows = []
    # Mon 09:00 bucket: values 100.0 ×4 and one 300.0 (v*n=1500e2 > 2*s=1400e2 → hi)
    for i, v in enumerate([100.0, 100.0, 100.0, 100.0, 300.0]):
        rows.append((i, f"2024-01-0{1 + (i % 1)} 09:{i:02d}:00", "buy", v))
    # Mon 23:00 bucket: flat 10.0 — no outliers
    for i in range(3):
        rows.append((10 + i, f"2024-01-01 23:0{i}:00", "buy", 10.0))
    ev = spark.createDataFrame(
        rows, "event_id: long, ts_s: string, event_type: string, value: double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type", "value")
    out = seasonal_outliers(ev)
    assert has_broadcast_join(out)  # stats side broadcast, fact never shuffles
    got = {(r["grp"], r["dow"]): r for r in out.collect()}
    mon = got[("buy", 0)]  # 2024-01-01 is the Monday epoch → dow 0
    assert mon["n_events"] == 8 and mon["n_hi"] == 1
    # the low side: 100s are NOT below half the bucket mean (mean=140)
    assert mon["n_lo"] == 0


def test_weekly_drift_ppm_and_first_week_null(spark):
    from dataflow_python_etl_spark.operators.timeseries import weekly_drift

    rows = []
    # week of Jan 1 (Mon): 4 events sum 40.00; week of Jan 8: 6 events sum 30.00
    for i in range(4):
        rows.append((i, f"2024-01-0{2 + i % 3} 10:00:00", "buy", i, 10.0))
    for i in range(6):
        rows.append((10 + i, f"2024-01-{8 + i % 4:02d} 10:00:00", "buy", i, 5.0))
    ev = spark.createDataFrame(
        rows,
        "event_id: long, ts_s: string, event_type: string, user_id: long, value: double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type", "user_id", "value")
    got = {str(r["week"]): r for r in weekly_drift(ev).collect()}
    w1, w2 = got["2024-01-01"], got["2024-01-08"]
    assert w1["n_events"] == 4 and w1["sum_cents"] == 4000
    assert w1["volume_drift_ppm"] is None and w1["value_drift_ppm"] is None
    assert w2["n_events"] == 6 and w2["n_users"] == 6 and w2["sum_cents"] == 3000
    # 6/4 → 1.5e6 − 1e6 = +500000 ppm; 3000/4000 → 750000 − 1e6 = −250000
    assert w2["volume_drift_ppm"] == 500_000
    assert w2["value_drift_ppm"] == -250_000


def test_referential_integrity_orphans_and_nulls(spark):
    from dataflow_python_etl_spark.operators.expectations import (
        referential_integrity,
    )

    parent = spark.createDataFrame([(1,), (2,), (2,)], "pid: long")
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk: long"
    )
    rows = referential_integrity(
        [("child->parent", child, "fk", parent, "pid")]
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # dangling 9 and the NULL FK are both orphans
    assert (r["relation"], r["n_rows"], r["n_orphans"]) == ("child->parent", 4, 2)
    # empty child: zero rows, zero orphans (not NULL)
    empty = referential_integrity(
        [("e", child.where(F.col("fk") > 100), "fk", parent, "pid")]
    ).first()
    assert (empty["n_rows"], empty["n_orphans"]) == (0, 0)
    with pytest.raises(ValueError, match="at least one"):
        referential_integrity([])


def test_table_diff_categories_and_validation(spark):
    from dataflow_python_etl_spark.operators.expectations import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k: long, s: string, v: long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 30), (4, "D", 40), (5, "e", 50)],
        "k: long, s: string, v: long",
    )
    r = table_diff(old, new, ["k"], ["s", "v"]).first()
    # 5 added; 1 removed; 3 NULL->30 changed, 4 d->D changed; 2 unchanged
    assert (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]) == (
        1, 1, 2, 1,
    )
    with pytest.raises(ValueError, match="key_cols"):
        table_diff(old, new, [], ["s"])
    with pytest.raises(ValueError, match="compare_cols"):
        table_diff(old, new, ["k"], [])
    # a duplicated key would fan out the join and inflate every
    # count — must fail loudly (the MERGE duplicate-key guard)
    dup = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 10), (2, "b", 20)], "k: long, s: string, v: long"
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        table_diff(dup, new, ["k"], ["s", "v"]).first()


def test_freshness_check_lag_volume_and_stale(spark):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.expectations import freshness_check

    # corpus "now" = 2024-01-29 00:00:00; type a fresh+growing, type b
    # stale (last event 4 days back) + shrinking, type c new this week
    rows = (
        [("a", "2024-01-28 23:59:50"), ("a", "2024-01-28 00:00:00"),
         ("a", "2024-01-16 00:00:00"),
         ("b", "2024-01-25 00:00:00"), ("b", "2024-01-16 00:00:00"),
         ("b", "2024-01-17 00:00:00"),
         ("c", "2024-01-27 00:00:00"),
         ("a", "2024-01-29 00:00:00")]
    )
    ev = spark.createDataFrame(rows, "event_type string, s string").select(
        "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    got = {
        r["grp"]: r.asDict()
        for r in freshness_check(ev, max_lag_s=3 * 86400, window_s=7 * 86400).collect()
    }
    assert got["a"]["lag_s"] == 0 and got["a"]["stale"] == 0
    assert got["a"]["n_recent"] == 3 and got["a"]["n_prior"] == 1
    assert got["a"]["volume_ratio_ppm"] == 3_000_000
    assert got["b"]["lag_s"] == 4 * 86400 and got["b"]["stale"] == 1
    assert got["b"]["n_recent"] == 1 and got["b"]["n_prior"] == 2
    assert got["b"]["volume_ratio_ppm"] == 500_000
    # new feed: prior window empty -> NULL ratio, not a fake boom
    assert got["c"]["n_prior"] == 0 and got["c"]["volume_ratio_ppm"] is None
    import pytest

    with pytest.raises(ValueError, match="must be > 0"):
        freshness_check(ev, max_lag_s=0)


def test_daily_autocorrelation_known_series(spark):
    """Alternating series -> r1 = -1; constant -> NULL; gap day
    enters as 0 (the spine rule)."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.timeseries import (
        daily_autocorrelation,
    )

    rows = []
    # 'alt': 2,1,2,1,... over 10 days (perfect negative lag-1)
    for i in range(10):
        for _ in range(2 if i % 2 == 0 else 1):
            rows.append(("alt", f"2024-01-{i + 1:02d} 12:00:00"))
    # 'flat': constant 1/day -> zero variance -> NULL
    for i in range(5):
        rows.append(("flat", f"2024-01-{i + 1:02d} 12:00:00"))
    # 'gap': days 1 and 3 only -> spine inserts day 2 as 0 (3 days, 2 pairs)
    rows += [("gap", "2024-01-01 12:00:00"), ("gap", "2024-01-03 12:00:00")]
    ev = spark.createDataFrame(rows, "event_type string, s string").select(
        "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    got = {r["grp"]: r.asDict() for r in daily_autocorrelation(ev).collect()}
    assert got["alt"]["n_days"] == 10 and got["alt"]["n_pairs"] == 9
    assert got["alt"]["r1"] == -1.0
    assert got["flat"]["r1"] is None
    assert got["gap"]["n_days"] == 3 and got["gap"]["n_pairs"] == 2
    assert got["gap"]["r1"] == -1.0  # 1,0,1 alternates too


def test_seasonal_naive_backtest_perfect_and_gappy(spark):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    rows = []
    # 'per': exact weekly periodicity over 21 days -> zero error
    weekly = [3, 1, 1, 1, 1, 2, 1]
    for i in range(21):
        for _ in range(weekly[i % 7]):
            rows.append(("per", f"2024-01-{i + 1:02d} 09:00:00"))
    # 'jmp': constant 1/day for 14 days except day 10 has 3
    for i in range(14):
        for _ in range(3 if i == 9 else 1):
            rows.append(("jmp", f"2024-01-{i + 1:02d} 09:00:00"))
    ev = spark.createDataFrame(rows, "event_type string, s string").select(
        "event_type", F.col("s").cast("timestamp").alias("ts")
    )
    got = {r["grp"]: r.asDict() for r in seasonal_naive_backtest(ev).collect()}
    p = got["per"]
    assert p["n_eval"] == 14 and p["total_abs_err"] == 0 and p["wmape_ppm"] == 0
    # jmp: eval days 8..14; day 10 (actual 3 vs forecast 1, err 2);
    # day 17 would see the spike as forecast but series ends day 14
    j = got["jmp"]
    assert j["n_eval"] == 7 and j["total_abs_err"] == 2
    assert j["total_actual"] == 9 and j["wmape_ppm"] == 2_000_000 // 9
    import pytest

    with pytest.raises(ValueError, match="season_days"):
        seasonal_naive_backtest(ev, season_days=0)


def test_trend_slope_exact_values(spark):
    """Crafted series: group 'up' has daily counts 1,2,3 on days
    0,1,2 -> slope exactly 1 (1_000_000 micro); group 'down' has
    3,1 on days 0,1 -> slope -2; group 'flat23' has counts 1,2 on
    days 0,1 -> slope +1; single-day group dropped. Half-up check:
    counts 1,2,2 -> slope 1/2 -> 500000."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.timeseries import trend_slope

    def mk(g, day_counts):
        rows = []
        for day, cnt in day_counts.items():
            for i in range(cnt):
                rows.append((g, f"1970-01-0{day + 1} 10:{i:02d}:00"))
        return rows

    rows = (
        mk("up", {0: 1, 1: 2, 2: 3})
        + mk("down", {0: 3, 1: 1})
        + mk("half", {0: 1, 1: 2, 2: 2})
        + mk("solo", {0: 4})
    )
    ev = spark.createDataFrame(rows, "event_type: string, ts_s: string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {r["event_type"]: r for r in trend_slope(ev, "event_type").collect()}
    assert "solo" not in got  # single active day: no slope
    assert got["up"]["slope_micro"] == 1_000_000 and got["up"]["n_days"] == 3
    assert got["down"]["slope_micro"] == -2_000_000
    assert got["half"]["slope_micro"] == 500_000  # exact half rounds up


def test_benford_deviation_integer_construction(spark):
    """Crafted cents values: leading digits 1,1,2,9; zero/negative
    excluded. obs for digit 1 = half-up(2/4 · 10⁶) = 500000; digits
    with no observations still report (spine join) with obs 0."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.expectations import (
        BENFORD_MICRO,
        benford_deviation,
    )

    assert sum(BENFORD_MICRO) == 1_000_000  # the table is a partition of 1
    rows = [(1.23,), (150.00,), (0.25,), (9.99,), (0.0,), (-5.0,)]
    df = spark.createDataFrame(rows, "v: double")
    got = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    assert got[1]["n"] == 2 and got[1]["obs_micro"] == 500_000
    assert got[1]["dev_micro"] == 500_000 - 301_030
    assert got[2]["n"] == 1 and got[2]["obs_micro"] == 250_000
    assert got[9]["n"] == 1
    assert got[3]["n"] == 0 and got[3]["obs_micro"] == 0
    assert got[3]["dev_micro"] == 124_939


def test_m4_downsample_four_points(spark):
    """Two buckets over a crafted span: bucket 0 gets values
    10, 3, 99 (first=10, min=3, max=99, last=99); bucket 1 gets a
    single point (all four collapse). Same-timestamp tie broken by
    id (ids 4,5 share ts: first=the lower id's value)."""
    import pytest
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.timeseries import m4_downsample

    rows = [
        (1, "2024-01-01 00:00:00", 10.0),
        (2, "2024-01-01 00:10:00", 3.0),
        (3, "2024-01-01 00:20:00", 99.0),
        (4, "2024-01-01 01:00:00", 7.0),   # same ts as 5
        (5, "2024-01-01 01:00:00", 8.0),
    ]
    ev = spark.createDataFrame(rows, "event_id: long, ts_s: string, value: double").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        F.lit("s").alias("event_type"), "value",
    )
    got = {r["bucket"]: r for r in m4_downsample(ev, "event_type", "ts", "value", n_buckets=2).collect()}
    assert set(got) == {0, 1}
    b0 = got[0]
    assert (b0["v_first"], b0["v_min"], b0["v_max"], b0["v_last"], b0["n"]) == (10.0, 3.0, 99.0, 99.0, 3)
    b1 = got[1]
    assert (b1["v_first"], b1["v_min"], b1["v_max"], b1["v_last"], b1["n"]) == (7.0, 7.0, 8.0, 8.0, 2)
    with pytest.raises(ValueError, match="n_buckets"):
        m4_downsample(ev, "event_type", "ts", "value", n_buckets=0)
