"""Count-Min sketch (q80): overcount-only invariant, mergeability,
and forced-collision behavior."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
)


def _items(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "item string")


def _est(spark, tokens, probes, **kw):
    sk = count_min_sketch(_items(spark, tokens), **kw)
    out = cms_estimate(
        sk,
        _items(spark, probes),
        **{k: kw[k] for k in ("depth", "width") if k in kw},
    )
    return {r.item: r.est for r in out.collect()}

def test_cms_exact_at_generous_width(spark):
    toks = ["a"] * 7 + ["b"] * 3 + ["c"]
    got = _est(spark, toks, ["a", "b", "c", "absent"])
    assert got == {"a": 7, "b": 3, "c": 1, "absent": 0}


def test_cms_never_undercounts_under_forced_collisions(spark):
    toks = [f"t{i}" for i in range(40) for _ in range(i % 5 + 1)]
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    got = _est(spark, toks, list(exact), depth=2, width=2)
    assert all(got[t] >= exact[t] for t in exact)
    # width 2 with 40 distinct tokens MUST collide somewhere
    assert any(got[t] > exact[t] for t in exact)


def test_cms_sketches_merge_by_cell_addition(spark):
    a, b = ["x"] * 4 + ["y"], ["x"] * 2 + ["z"] * 3
    sk_a = count_min_sketch(_items(spark, a))
    sk_b = count_min_sketch(_items(spark, b))
    merged = (
        sk_a.union(sk_b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = count_min_sketch(_items(spark, a + b))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    got = {r.item: r.est for r in cms_estimate(merged, _items(spark, ["x", "y", "z"])).collect()}
    assert got == {"x": 6, "y": 1, "z": 3}


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame([("a", 5), ("a", 2), ("b", 1)], "item string, w int")
    sk = count_min_sketch(df, weight_col="w")
    got = {r.item: r.est for r in cms_estimate(sk, _items(spark, ["a", "b"])).collect()}
    assert got == {"a": 7, "b": 1}


def test_cms_validation(spark):
    with pytest.raises(ValueError, match="depth"):
        count_min_sketch(None, depth=0)
    with pytest.raises(ValueError, match="depth"):
        count_min_sketch(None, width=1)
