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


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from dataflow_python_etl_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = _items(spark, [f"m{i}" for i in range(200)])
    bloom = bloom_build(members, n_bits=4096, n_hashes=5)
    probes = _items(spark, [f"m{i}" for i in range(200)] + [f"x{i}" for i in range(200)])
    got = {
        r.item: r.might_contain
        for r in bloom_might_contain(probes, bloom, n_bits=4096, n_hashes=5).collect()
    }
    # no false negatives — every member answers true
    assert all(got[f"m{i}"] for i in range(200))
    # false positives exist in principle but stay near the sized rate
    # ((1-e^(-kn/m))^k ~ 0.9% here); deterministic, so a generous
    # ceiling cannot flake
    fps = sum(got[f"x{i}"] for i in range(200))
    assert fps <= 10


def test_bloom_merge_is_bit_union(spark):
    from dataflow_python_etl_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    a = bloom_build(_items(spark, ["a1", "a2"]), n_bits=1024, n_hashes=3)
    b = bloom_build(_items(spark, ["b1"]), n_bits=1024, n_hashes=3)
    merged = a.union(b).distinct()
    both = bloom_build(_items(spark, ["a1", "a2", "b1"]), n_bits=1024, n_hashes=3)
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in both.collect()
    )
    got = {
        r.item: r.might_contain
        for r in bloom_might_contain(
            _items(spark, ["a1", "b1", "zz"]), merged, n_bits=1024, n_hashes=3
        ).collect()
    }
    assert got["a1"] and got["b1"] and not got["zz"]


def test_bloom_validation(spark):
    from dataflow_python_etl_spark.operators.sketches import bloom_build

    with pytest.raises(ValueError, match="n_bits"):
        bloom_build(None, n_bits=1)


def test_hll_registers_bounded_and_mergeable(spark):
    from dataflow_python_etl_spark.operators.sketches import hll_registers

    a = hll_registers(_items(spark, [f"a{i}" for i in range(500)]), p=4)
    b = hll_registers(_items(spark, [f"b{i}" for i in range(500)]), p=4)
    assert a.count() <= 16 and b.count() <= 16
    merged = a.union(b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    both = hll_registers(
        _items(spark, [f"a{i}" for i in range(500)] + [f"b{i}" for i in range(500)]),
        p=4,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))


def test_hll_estimate_accuracy_in_raw_regime(spark):
    from dataflow_python_etl_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 20_000
    items = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("item"))
    regs = hll_registers(items, p=10)  # 1024 registers -> ~3.3% expected
    est = hll_estimate(regs, p=10).collect()[0].est
    assert abs(est - n) / n < 0.15  # deterministic, generous band

    import pytest as _pt

    with _pt.raises(ValueError, match="p must"):
        hll_registers(items, p=2)


# ---------------------------------------------------------------------------
# cms_heavy_hitters (q103)
# ---------------------------------------------------------------------------


def test_cms_heavy_hitters_never_hides_a_heavy_item(spark):
    """The planted dominant item ranks first with est >= its true
    count (overcount-only), and the output is exactly k rows ordered
    (est DESC, item)."""
    from dataflow_python_etl_spark.operators.sketches import cms_heavy_hitters

    rows = [("whale",)] * 500 + [(f"minnow{i}",) for i in range(200)]
    items = spark.createDataFrame(rows, "item string")
    got = cms_heavy_hitters(items, k=5).collect()
    assert len(got) == 5
    assert got[0]["item"] == "whale" and got[0]["est"] >= 500
    ests = [r["est"] for r in got]
    assert ests == sorted(ests, reverse=True)


def test_kmv_sketch_bounded_sorted_and_merge_law(spark):
    """kmv(A ∪ B) == k-min of the merged sketches — THE property that
    makes KMV shardable at 100 TB (sketch shards independently,
    merge constant-size)."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.sketches import kmv_sketches

    k = 32
    a = spark.createDataFrame([("a", i) for i in range(200)], "s string, x long")
    b = spark.createDataFrame([("b", i) for i in range(150, 400)], "s string, x long")
    u = a.union(b).select(F.lit("u").alias("s"), "x")
    ska = kmv_sketches(a, "s", "x", k).first()["hashes"]
    skb = kmv_sketches(b, "s", "x", k).first()["hashes"]
    sku = kmv_sketches(u, "s", "x", k).first()["hashes"]
    assert len(ska) == k and ska == sorted(ska)
    assert sku == sorted(set(ska) | set(skb))[:k]


def test_kmv_overlap_estimates_and_empty_set(spark):
    from dataflow_python_etl_spark.operators.sketches import kmv_overlap

    k = 64
    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(300, 1100)]
    df = spark.createDataFrame(rows, "s string, x long")
    r = kmv_overlap(df, "s", "x", "a", "b", k=k).first()
    # within KMV's ~1/sqrt(k) regime of the true 500 / 800 / 1100
    assert abs(r["est_a"] - 500) < 500 * 0.5
    assert abs(r["est_b"] - 800) < 800 * 0.5
    assert abs(r["est_union"] - 1100) < 1100 * 0.5
    assert 0 < r["jaccard_ppm"] < 1_000_000
    # unsaturated side reports EXACTLY (sketch holds every key)
    small = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(5, 15)],
        "s string, x long",
    )
    rs = kmv_overlap(small, "s", "x", "a", "b", k=k).first()
    assert (rs["est_a"], rs["est_b"], rs["est_union"]) == (10, 10, 15)
    assert rs["n_common"] == 5 and rs["jaccard_ppm"] == 5 * 1_000_000 // 15
    # an audience absent from the frame is empty, not NULL-poisoned
    re = kmv_overlap(small, "s", "x", "a", "zzz", k=k).first()
    assert (re["est_a"], re["est_b"], re["est_union"]) == (10, 0, 10)
    assert re["n_common"] == 0 and re["jaccard_ppm"] == 0
    import pytest

    from dataflow_python_etl_spark.operators.sketches import kmv_sketches

    with pytest.raises(ValueError, match="k must be"):
        kmv_sketches(small, "s", "x", 1)


def test_mmr_prefers_diverse_over_near_duplicate(spark):
    """Plain top-2 returns the two near-copies; MMR keeps the best
    copy and swaps the second for the orthogonal-but-relevant one."""
    from dataflow_python_etl_spark.operators.similarity import mmr_select

    def vec(x, y, z):
        return [float(x), float(y), float(z)] + [0.0] * 61

    rows = [
        (0, vec(1.0, 0.0, 0.0)),     # query
        (1, vec(1.0, 0.01, 0.0)),    # near-copy of query (best rel)
        (2, vec(1.0, 0.011, 0.0)),   # near-copy of 1
        (3, vec(0.8, 0.0, 0.6)),     # less relevant, diverse
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mmr_select(emb, query_id=0, k=2, n_candidates=3).collect()
    assert [r["vec_id"] for r in got] == [1, 3]
    assert got[0]["rank"] == 1 and got[0]["mmr"] == 0.5 * got[0]["relevance"]
    # rank 2 was penalized by its similarity to the already-chosen 1
    assert got[1]["mmr"] < 0.5 * got[1]["relevance"]
    import pytest

    with pytest.raises(ValueError, match="1 <= k"):
        mmr_select(emb, query_id=0, k=5, n_candidates=3)


def test_cms_self_join_size_exact_without_collisions_overcounts_with(spark):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.sketches import (
        cms_self_join_size,
        count_min_sketch,
    )

    # 3 keys with counts 2, 3, 5: F2 = 4 + 9 + 25 = 38. At width 1024
    # three items collide with probability ~0 per row but min-over-
    # rows protects even that; the estimate must be >= and here ==.
    rows = [("a",)] * 2 + [("b",)] * 3 + [("c",)] * 5
    df = spark.createDataFrame(rows, "item string")
    est = cms_self_join_size(count_min_sketch(df)).first()["est_pairs"]
    assert est == 38
    # force collisions: width 2 -> cross terms inflate, never deflate
    est2 = cms_self_join_size(count_min_sketch(df, width=2)).first()["est_pairs"]
    assert est2 >= 38
