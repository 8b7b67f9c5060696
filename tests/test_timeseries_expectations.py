"""Time-series gap-fill rollup (q72) and data-quality expectations
(q73): crafted-fixture semantics plus the one-scan / no-Python plan
properties."""

import datetime as dt

import pytest

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
