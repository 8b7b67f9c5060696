"""Mergeable quantile sketch (q144): HDR-style base-2 grid —
exactness below the grid, the 2^-p accuracy band vs exact
percentiles, the additive merge law through refresh_additive_agg,
the streaming MV sink, and the loud-negative guard."""

import random

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.sketches import (
    QSK_PRECISION,
    quantile_estimate,
    quantile_sketch,
)


def _vals(spark, values, grp="g"):
    return spark.createDataFrame([(grp, v) for v in values], "g string, v long")


def test_small_values_bucket_exactly(spark):
    """Below 2^(p+1) the bucket IS the value: estimates at any
    quantile equal the exact order statistic."""
    values = [0, 1, 2, 3, 5, 8, 13, 100, 255]
    sk = quantile_sketch(_vals(spark, values), "v", ["g"])
    # identity region: one bucket per distinct value, id == value
    assert {r["bucket"] for r in sk.collect()} == set(values)
    est = {
        r["q_ppm"]: r["est"]
        for r in quantile_estimate(
            sk, ["g"], quantiles_ppm=(1, 500_000, 1_000_000)
        ).collect()
    }
    n = len(values)
    exact = sorted(values)
    # rank = ceil(q * n): q=1ppm -> rank 1 (min), q=0.5 -> rank 5, q=1 -> max
    assert est[1] == exact[0]
    assert est[500_000] == exact[(n * 500_000 + 999_999) // 1_000_000 - 1]
    assert est[1_000_000] == exact[-1]


def test_accuracy_band_vs_exact_percentiles(spark):
    """For any data, est <= exact rank-ceil(q*n) statistic and
    exact < est * (1 + 2^-p) once the statistic is >= 2^(p+1) —
    the band the docstring promises, pinned on seeded lognormal-ish
    integers spanning six decades."""
    rng = random.Random(144)
    values = [int(10 ** (rng.random() * 6)) for _ in range(5000)]
    qs = (100_000, 500_000, 900_000, 990_000, 999_000)
    sk = quantile_sketch(_vals(spark, values), "v", ["g"])
    got = {
        r["q_ppm"]: (r["est"], r["n_rows"])
        for r in quantile_estimate(sk, ["g"], quantiles_ppm=qs).collect()
    }
    exact = sorted(values)
    n = len(values)
    for q in qs:
        rank = (n * q + 999_999) // 1_000_000
        true = exact[rank - 1]
        est, n_rows = got[q]
        assert n_rows == n
        assert est <= true, (q, est, true)
        if true >= 2 ** (QSK_PRECISION + 1):
            assert true < est * (1 + 2 ** -QSK_PRECISION), (q, est, true)
        else:
            assert est == true


def test_sketch_size_bounded_and_jvm_only(spark):
    """The whole point at 100 TB: sketch rows are bounded by the
    GRID (<= (64-p)*2^p + 2^(p+1)), not the data; the build plan is
    one exchange and never leaves the JVM."""
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str

    rng = random.Random(7)
    values = [rng.randrange(0, 2**40) for _ in range(20000)]
    sk = quantile_sketch(_vals(spark, values), "v", ["g"])
    n_buckets = sk.count()
    assert n_buckets <= (64 - QSK_PRECISION) * 2**QSK_PRECISION + 2 ** (
        QSK_PRECISION + 1
    )
    # 20k values spanning 2^40 collapse to ~thousands of buckets
    assert n_buckets < 5000
    plan = explain_str(sk)
    assert "EvalPython" not in plan
    assert count_exchanges(sk) == 1


def test_merge_law_additive_refresh(spark, tmp_path):
    """sketch(A) folded with sketch(B) via refresh_additive_agg ==
    sketch(A ∪ B) bit-for-bit — additivity IS the merge law, so the
    MV machinery maintains quantile sketches with no new code."""
    from dataflow_python_etl_spark.operators.upsert import refresh_additive_agg

    rng = random.Random(9)
    a = [rng.randrange(0, 10**7) for _ in range(800)]
    b = [rng.randrange(0, 10**7) for _ in range(700)]
    path = str(tmp_path / "mv")
    refresh_additive_agg(
        spark, path, quantile_sketch(_vals(spark, a), "v", ["g"]), ["g", "bucket"]
    )
    refresh_additive_agg(
        spark, path, quantile_sketch(_vals(spark, b), "v", ["g"]), ["g", "bucket"]
    )
    merged = {
        (r["g"], r["bucket"]): r["cnt"] for r in spark.read.parquet(path).collect()
    }
    full = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in quantile_sketch(_vals(spark, a + b), "v", ["g"]).collect()
    }
    assert merged == full
    # and the estimates read off the merged MV match the full build
    est_mv = sorted(
        map(tuple, quantile_estimate(spark.read.parquet(path), ["g"]).collect())
    )
    est_full = sorted(
        map(
            tuple,
            quantile_estimate(
                quantile_sketch(_vals(spark, a + b), "v", ["g"]), ["g"]
            ).collect(),
        )
    )
    assert est_mv == est_full


def test_streaming_quantile_mv_parity(spark, tmp_path):
    """stream_additive_agg_to_table with agg_fn=quantile_sketch:
    after two micro-batches the persisted sketch equals the
    full-history build — the streaming quantile MV is literally the
    additive sink plus this operator."""
    from dataflow_python_etl_spark.operators.upsert import (
        stream_additive_agg_to_table,
    )
    from dataflow_python_etl_spark.sources.catalog import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    prep = lambda df: df.select(  # noqa: E731
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    agg = lambda df: quantile_sketch(prep(df), "cents", ["event_type"])  # noqa: E731

    src, table, ckpt = (str(tmp_path / d) for d in ("in", "mv", "ckpt"))
    cutoff = "2024-01-15"
    ev.where(F.col("ts") < cutoff).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = stream_additive_agg_to_table(stream, table, ckpt, ["event_type", "bucket"], agg)
    try:
        q.processAllAvailable()
        ev.where(F.col("ts") >= cutoff).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.read.parquet(table).collect()))
    want = sorted(map(tuple, agg(ev).collect()))
    assert got == want
    # the MV answers p99s per event type without ever re-reading facts
    est = quantile_estimate(
        spark.read.parquet(table), ["event_type"], quantiles_ppm=(990_000,)
    )
    assert est.count() == ev.select("event_type").distinct().count()


def test_validation_and_negative_guard(spark):
    ok = _vals(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="precision_bits"):
        quantile_sketch(ok, "v", ["g"], precision_bits=0)
    with pytest.raises(ValueError, match="absent"):
        quantile_sketch(ok, "missing", ["g"])
    with pytest.raises(ValueError, match="quantiles_ppm"):
        quantile_estimate(quantile_sketch(ok, "v", ["g"]), ["g"], quantiles_ppm=(0,))
    # negatives raise loudly AT EXECUTION (filter-anchored guard —
    # a dead projected column would be pruned away)
    bad = quantile_sketch(_vals(spark, [5, -3]), "v", ["g"])
    with pytest.raises(Exception, match="negative value"):
        bad.collect()
    # nulls are dropped, not counted
    withnull = spark.createDataFrame([("g", 4), ("g", None)], "g string, v long")
    assert quantile_sketch(withnull, "v", ["g"]).agg(F.sum("cnt")).collect()[0][0] == 1


def test_winsorize_by_sketch_band_and_tail_semantics(spark):
    """The sketch-path winsorize report vs ground truth: each bound
    is <= the exact rank statistic and within 2^-p relative of it;
    the tail counts are EXACT for the reported bounds (n_below =
    #values < p_lo's bucket, i.e. all strictly below p_lo; n_above =
    #values in buckets above p_hi's, all >= its upper edge)."""
    from dataflow_python_etl_spark.operators.expectations import (
        winsorize_bounds_by_sketch,
    )

    rng = random.Random(146)
    values = [int(10 ** (rng.random() * 5)) + 256 for _ in range(4000)]
    df = _vals(spark, values)
    lo_ppm, hi_ppm = 10_000, 990_000
    row = winsorize_bounds_by_sketch(
        df, "v", ["g"], lower_ppm=lo_ppm, upper_ppm=hi_ppm
    ).collect()[0]
    n = len(values)
    exact = sorted(values)
    assert row["n_total"] == n
    for ppm, bound in ((lo_ppm, row["p_lo"]), (hi_ppm, row["p_hi"])):
        true = exact[(n * ppm + 999_999) // 1_000_000 - 1]
        assert bound <= true < bound * (1 + 2 ** -QSK_PRECISION), (ppm, bound, true)
    # tail counts are exact w.r.t. the reported bounds
    assert row["n_below"] == sum(1 for v in values if v < row["p_lo"])
    # everything counted above sits in buckets after p_hi's: all
    # values > any value in p_hi's bucket; at bucket granularity
    # that is "strictly above the bucket", pinned via the rank walk
    rank_hi = (n * hi_ppm + 999_999) // 1_000_000
    assert row["n_above"] <= n - rank_hi + 0  # never overshoots the tail
    assert row["n_above"] >= sum(
        1 for v in values if v >= row["p_hi"] * (1 + 2 ** -QSK_PRECISION) + 1
    ) - 1  # and misses at most the boundary bucket

    with pytest.raises(ValueError, match="lower_ppm"):
        winsorize_bounds_by_sketch(df, "v", ["g"], lower_ppm=0)


def test_winsorize_by_sketch_is_mv_maintainable(spark, tmp_path):
    """What the exact winsorize can NEVER do (a percentile is not
    additive): fold new data into the persisted sketch MV and read
    refreshed clip bounds off it WITHOUT touching fact history —
    winsorize_from_sketch(MV) == winsorize_bounds_by_sketch(full
    data), row for row."""
    from dataflow_python_etl_spark.operators.expectations import (
        winsorize_bounds_by_sketch,
        winsorize_from_sketch,
    )
    from dataflow_python_etl_spark.operators.upsert import refresh_additive_agg

    rng = random.Random(21)
    a = [rng.randrange(300, 10**6) for _ in range(900)]
    b = [rng.randrange(300, 10**6) for _ in range(600)]
    path = str(tmp_path / "mv")
    for chunk in (a, b):
        refresh_additive_agg(
            spark,
            path,
            quantile_sketch(_vals(spark, chunk), "v", ["g"]),
            ["g", "bucket"],
        )
    off_mv = sorted(
        map(tuple, winsorize_from_sketch(spark.read.parquet(path), ["g"]).collect())
    )
    off_full = sorted(
        map(
            tuple,
            winsorize_bounds_by_sketch(_vals(spark, a + b), "v", ["g"]).collect(),
        )
    )
    assert off_mv == off_full and len(off_mv) == 1


def test_quantile_rollup_global_equals_ungrouped_sketch(spark):
    """Cross-group merge algebra: summing per-group buckets per
    bucket id == the sketch built with no grouping, so a grouped
    quantile MV answers every coarser grain exactly as if built at
    that grain."""
    rng = random.Random(149)
    rows = [(f"g{i % 7}", rng.randrange(0, 10**6)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    per_group = quantile_sketch(df, "v", ["g"])
    rolled = {
        r["bucket"]: r["cnt"]
        for r in per_group.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
    }
    flat = {
        r["bucket"]: r["cnt"] for r in quantile_sketch(df, "v", []).collect()
    }
    assert rolled == flat
    # and the estimates read at the rolled-up grain match exactly
    est_rolled = sorted(
        map(
            tuple,
            quantile_estimate(
                per_group.groupBy("bucket")
                .agg(F.sum("cnt").cast("long").alias("cnt")),
                [],
            ).collect(),
        )
    )
    est_flat = sorted(
        map(tuple, quantile_estimate(quantile_sketch(df, "v", []), []).collect())
    )
    assert est_rolled == est_flat
