"""PageRank (q77) and rolling z-score anomalies (q78): hand-computed
fixtures plus the determinism-by-construction properties."""

import datetime as dt

import pytest

from dataflow_python_etl_spark.operators.graph import pagerank
from dataflow_python_etl_spark.operators.timeseries import rolling_anomalies
from dataflow_python_etl_spark.plans.checks import explain_str
from dataflow_python_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_one_iteration_hand_computed(spark):
    # a->b, a->c, b->c; N=3, r0=1/3
    # r1(a) = 0.15/3 = 0.05
    # r1(b) = 0.05 + 0.85*(1/3)/2       = 0.191666667
    # r1(c) = 0.05 + 0.85*((1/3)/2 + 1/3) = 0.475
    got = {
        r.node: r.rank
        for r in pagerank(
            _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")]), iterations=1
        ).collect()
    }
    assert got["a"] == pytest.approx(0.05, abs=1e-9)
    assert got["b"] == pytest.approx(0.05 + 0.85 / 6, abs=1e-8)
    assert got["c"] == pytest.approx(0.475, abs=1e-9)


def test_pagerank_sink_accumulates_and_mass_bounded(spark):
    edges = _edges(spark, [("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")])
    got = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert got["z"] == max(got.values())  # everyone points at the sink
    assert sum(got.values()) <= 1.0 + 1e-9  # dangling mass not re-injected
    # duplicate edges must not double-count (distinct edge set)
    dup = _edges(spark, [("a", "z"), ("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")])
    got2 = {r.node: r.rank for r in pagerank(dup, iterations=5).collect()}
    assert got2 == got


def test_pagerank_validation():
    with pytest.raises(ValueError, match="iterations"):
        pagerank(None, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(None, damping=1.5)


def _series(spark, rows):
    return spark.createDataFrame(
        [(g, dt.datetime(2024, 1, 1 + h // 24, h % 24), v) for g, h, v in rows],
        "event_type string, ts timestamp, value double",
    )


def test_anomaly_spike_flagged_only_with_variance(spark):
    # 20 buckets alternating 10.0/10.02 (tiny variance), then a spike
    varied = [("m", h, 10.0 if h % 2 == 0 else 10.02) for h in range(20)]
    spike = [("m", 20, 100.0)]
    out = {
        r.bucket_ts.hour + 24 * (r.bucket_ts.day - 1): r
        for r in rolling_anomalies(
            _series(spark, varied + spike), min_history=12
        ).collect()
    }
    assert out[20].is_anomaly
    assert out[20].avg_value == 100.0
    # early buckets (< min_history trailing) never flag
    assert not any(out[h].is_anomaly for h in range(12))
    # normal buckets inside the band stay quiet
    assert not any(out[h].is_anomaly for h in range(12, 20))


def test_anomaly_zero_variance_history_cannot_flag(spark):
    flat = [("m", h, 10.0) for h in range(20)] + [("m", 20, 100.0)]
    out = rolling_anomalies(_series(spark, flat), min_history=12).collect()
    # constant history has sigma=0: the roll_std > 0 guard keeps the
    # spike unflagged rather than dividing by zero enthusiasm
    assert not any(r.is_anomaly for r in out)


def test_anomaly_moments_are_exact_micro_units(spark):
    # bucket mean of [10.01, 10.02] = 10.015 exactly (integer half-up
    # division to micro-units — no float drift)
    rows = [("m", 0, 10.01), ("m", 0, 10.02)]
    r = rolling_anomalies(_series(spark, rows)).collect()[0]
    assert r.avg_value == 10.015


def test_graph_anomaly_plans_stay_jvm(spark):
    for q in ("q77_pagerank", "q78_rolling_anomalies"):
        df = QUERIES[q].fn(spark, SF_DIR)
        assert "EvalPython" not in explain_str(df), q


def test_triangle_count_known_graphs(spark):
    from dataflow_python_etl_spark.operators.graph import triangle_count

    def tc(pairs):
        df = spark.createDataFrame(pairs, "src long, dst long")
        return triangle_count(df).collect()[0]

    # K4: 4 triangles; duplicates/reversed/self-loop edges ignored
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    r = tc(k4 + [(0, 0), (1, 0)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # path graph: no triangles
    r = tc([(1, 2), (2, 3), (3, 4)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 3, 0)
    # star + one rim edge: exactly one triangle, hub degree maximal —
    # orientation counts it from a rim apex
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    r = tc(star)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 6, 1)


# ---------------------------------------------------------------------------
# bfs_hops (q100)
# ---------------------------------------------------------------------------


def test_bfs_hops_path_graph(spark):
    """Path a-b-c-d-e seeded at a: one node per hop, e beyond
    max_hops excluded; reversed edge storage and self-loops are
    direction/noise-invariant."""
    from dataflow_python_etl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "a")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["hop"]: r["n_nodes"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}


def test_bfs_hops_isolated_seed_and_zero_hops(spark):
    from dataflow_python_etl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([("x", "y")], "src string, dst string")
    seeds = spark.createDataFrame([("lonely",), ("x",)], "node string")
    got = {r["hop"]: r["n_nodes"] for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    assert got == {0: 2, 1: 1}
    zero = {r["hop"]: r["n_nodes"] for r in bfs_hops(edges, seeds, max_hops=0).collect()}
    assert zero == {0: 2}


def test_weighted_shortest_paths_relaxation(spark):
    """Hand graph: two-hop cheaper than direct; hop bound excludes
    longer cheap walks; unreachable nodes absent."""
    import pytest
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.graph import weighted_shortest_paths

    edges = spark.createDataFrame(
        [
            ("a", "b", 10),
            ("a", "c", 1),
            ("c", "b", 2),      # a->c->b = 3 beats direct 10
            ("b", "d", 1),      # a->c->b->d = 4 (3 hops)
            ("d", "e", 1),      # best e: a->c->b->d->e = 5 (4 hops)
            ("e", "f", 1),      # best f within 4 hops: a->b->d->e->f = 13
            ("x", "y", 1),      # disconnected from a
        ],
        "src: string, dst: string, w: long",
    )
    got = {r["node"]: r["d"] for r in weighted_shortest_paths(edges, "a").collect()}
    assert got == {"a": 0, "b": 3, "c": 1, "d": 4, "e": 5, "f": 13}
    # tighter hop bound: f needs >= 4 edges; e falls back to the
    # expensive 3-hop walk a->b->d->e = 12
    got3 = {
        r["node"]: r["d"]
        for r in weighted_shortest_paths(edges, "a", max_hops=3).collect()
    }
    assert "f" not in got3 and got3["d"] == 4 and got3["e"] == 12
    with pytest.raises(ValueError, match="max_hops"):
        weighted_shortest_paths(edges, "a", max_hops=0)


def test_join_key_skew_ranking_and_shares(spark):
    from dataflow_python_etl_spark.operators.profile import join_key_skew

    df = spark.createDataFrame(
        [(k,) for k in [1] * 6 + [2] * 3 + [3] * 1], "k: long"
    )
    rows = join_key_skew(df, "k", top_k=2).collect()
    assert [(r["key"], r["n_rows"], r["pair_volume"], r["share_ppm"]) for r in rows] == [
        (1, 6, 36, 600_000),
        (2, 3, 9, 300_000),
    ]


def test_clustering_coefficients_known_graph(spark):
    """K4 minus one edge: nodes 1-2-3-4 with edges 12,13,14,23,24
    (missing 34). T(1)=2 (123,124), T(2)=2, T(3)=1, T(4)=1;
    deg 1=3, 2=3, 3=2, 4=2. cc(1)=2·2/(3·2)=2/3→666667;
    cc(3)=2·1/2=1→1000000. Degree-1 node 5 (edge 5-1... keep out:
    add isolated pair 5-6: both degree 1 -> dropped."""
    from dataflow_python_etl_spark.operators.graph import clustering_coefficients

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (5, 6), (2, 1)],
        "src: long, dst: long",
    )
    got = {r["node"]: r for r in clustering_coefficients(edges).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["degree"] == 3 and got[1]["n_triangles"] == 2
    assert got[1]["cc_ppm"] == 666_667
    assert got[2]["cc_ppm"] == 666_667
    assert got[3]["degree"] == 2 and got[3]["n_triangles"] == 1
    assert got[3]["cc_ppm"] == 1_000_000
    assert got[4]["cc_ppm"] == 1_000_000


def test_checkpoint_cadence_bounds_plan_depth(spark):
    """checkpoint_every truncates the iterated frame's lineage on
    cadence: at depth 10, the un-checkpointed PageRank plan carries
    all 10 rounds' joins while the cadence-2 plan carries at most
    one cadence window's worth above an ExistingRDD leaf — and the
    ranks are bit-identical (localCheckpoint changes lineage, never
    values)."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.operators.graph import bfs_hops, pagerank

    edges = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
    )
    try:
        deep = pagerank(edges, iterations=10)
        capped = pagerank(edges, iterations=10, checkpoint_every=2)
        plan_deep = deep._jdf.queryExecution().optimizedPlan().toString()
        plan_capped = capped._jdf.queryExecution().optimizedPlan().toString()
        assert plan_deep.count("Join") >= 20  # 2 joins per round x 10
        # cadence 2 -> at most the last (unfinished) window's joins
        assert plan_capped.count("Join") <= 4, plan_capped.count("Join")
        assert "LogicalRDD" in plan_capped and "LogicalRDD" not in plan_deep
        assert sorted(map(tuple, capped.collect())) == sorted(
            map(tuple, deep.collect())
        )

        # BFS is the op that NEEDS the cadence: the frontier chain
        # references both prior frames, so the plan tree grows ~3x
        # per hop — at depth 10 with checkpoint_every=None the driver
        # OOMs formatting the execution description (measured; hence
        # the default cadence of 4). Depth 10 runs only WITH a
        # cadence; value identity vs full lineage is pinned at the
        # deepest depth full lineage still survives.
        path = _edges(spark, [(str(i), str(i + 1)) for i in range(10)])
        seeds = spark.createDataFrame([("0",)], "node string")
        b = bfs_hops(path, seeds, max_hops=10, checkpoint_every=3)
        assert "LogicalRDD" in b._jdf.queryExecution().optimizedPlan().toString()
        assert {r["hop"]: r["n_nodes"] for r in b.collect()} == {
            h: 1 for h in range(11)
        }
        a6 = bfs_hops(path, seeds, max_hops=6, checkpoint_every=None)
        b6 = bfs_hops(path, seeds, max_hops=6, checkpoint_every=2)
        assert sorted(map(tuple, b6.collect())) == sorted(map(tuple, a6.collect()))

        with pytest.raises(ValueError, match="checkpoint_every"):
            pagerank(edges, iterations=2, checkpoint_every=0)
        with pytest.raises(ValueError, match="checkpoint_every"):
            bfs_hops(path, seeds, max_hops=2, checkpoint_every=-1)
    finally:
        unpersist_all()


def test_wedge_join_hot_apex_skew_split(spark):
    """Planted-hub skew evidence for the repo's heaviest shuffle
    (the q87/q138 wedge self-join, graph._wedges). The orientation
    bounds apex out-degree at O(sqrt m), but a residual hot apex is
    still one join key holding C(out_deg, 2) wedges. Construction:
    hub 'a_hub' tied-by-id into 250 'heavy' spokes (each padded with
    249 leaves so degree ties orient hub->heavy), so EVERY wedge has
    the hub as apex — 31,125 rows on one key. MEASURED pin, mirroring
    test_band_index: with AQE skew-join (session default; thresholds
    lowered to fire at test bytes) the hot apex's join rows spread
    across >= 4 tasks with a bounded max share, vs the control run
    (skew off) where one task eats essentially everything. Output
    identical either way."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.operators.graph import _orient, _wedges, triangle_count

    k = 250
    # md5-suffixed ids keep the hot partition's shuffle bytes
    # incompressible (sequential h0001/h0002... compressed below the
    # detection threshold and the splitter never fired)
    heavy = lambda c: F.concat(F.lit("h_"), F.md5(c.cast("string")))  # noqa: E731
    spokes = spark.range(k).select(
        F.lit("a_hub").alias("src"), heavy(F.col("id")).alias("dst")
    )
    leaves = spark.range(k * (k - 1)).select(
        heavy(F.col("id") % k).alias("src"),
        F.concat(F.lit("z_"), F.md5((F.col("id") + 1_000_000).cast("string"))).alias("dst"),
    )
    # 10 disjoint heavy-heavy pairs -> exactly 10 hub triangles
    pairs = spark.range(10).select(
        heavy(F.col("id") * 2).alias("src"),
        heavy(F.col("id") * 2 + 1).alias("dst"),
    )
    edges = spokes.union(leaves).union(pairs)
    try:
        _, _, oriented = _orient(edges, "src", "dst")
        wedges = _wedges(oriented)

        def run(skew_conf):
            conf = {
                # at 100 TB the oriented edge set never broadcasts
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
                # AQE skew detection is INPUT-byte based: with 512
                # reduce partitions the hot apex's 250 rows are ~3x
                # the median partition (vs 1.1x at 32, where the
                # leaf-edge padding drowns the signal and the
                # splitter — correctly — sees no input skew)
                "spark.sql.shuffle.partitions": "512",
                **skew_conf,
            }
            prev = {c: spark.conf.get(c, None) for c in conf}
            for c, v in conf.items():
                spark.conf.set(c, v)
            try:
                dist = (
                    wedges.withColumn("pid", F.spark_partition_id())
                    .groupBy("pid")
                    .count()
                    .collect()
                )
            finally:
                for c, v in prev.items():
                    spark.conf.set(c, v) if v is not None else spark.conf.unset(c)
            rows = sorted((r["count"] for r in dist), reverse=True)
            return rows, sum(rows)

        control, total_c = run({"spark.sql.adaptive.skewJoin.enabled": "false"})
        balanced, total_b = run({
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        })
        # identical wedge output: every wedge sits at the hub apex
        assert total_c == total_b == k * (k - 1) // 2
        # control: the hot apex is one task holding everything
        assert control[0] / total_c > 0.85, control[:5]
        # skew split: hot key demonstrably divided, bounded max share
        assert len(balanced) >= 4, balanced
        assert balanced[0] / total_b <= 0.5, balanced[:8]
        assert balanced[0] < control[0] / 2, (balanced[0], control[0])

        # and the end-to-end count on the planted graph is exact
        tri = triangle_count(edges).collect()[0]
        assert tri["n_triangles"] == 10
    finally:
        unpersist_all()


def test_k_core_known_graph(spark):
    """Hand-computed: a 4-clique {1,2,3,4} with a pendant path
    5-6 hanging off node 1, plus a triangle {7,8,9} sharing no nodes.
    2-core = clique + triangle (path peels in 2 cascading rounds);
    3-core = the clique alone; 4-core = empty. Direction, duplicate
    edges, and self-loops must not matter."""
    from dataflow_python_etl_spark.operators.graph import k_core

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = clique + [(1, 5), (5, 6), (7, 8), (8, 9), (9, 7)]
    # noise: reversed duplicate, exact duplicate, self-loop
    edges += [(2, 1), (7, 8), (6, 6)]
    df = spark.createDataFrame(edges, "src: long, dst: long")

    core2 = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
    assert core2 == {1: 3, 2: 3, 3: 3, 4: 3, 7: 2, 8: 2, 9: 2}
    core3 = {r["node"]: r["core_degree"] for r in k_core(df, k=3).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}
    assert k_core(df, k=4).count() == 0  # empty core: no rows, no error


def test_k_core_early_exit_rounds(spark):
    """The early exit rides a count() on the frame each round just
    localCheckpointed and stops one round after the cascade settles
    (unchanged edge count ⟺ fixpoint, peeling is monotone) — the
    fixed `rounds` cap stops being the typical cost (q155 measured
    8.8 s at sf0.01 vs 6.1 s at sf0.1: pure no-op-round overhead).
    Pin measured rounds == cascade depth + 1 on known graphs, exact
    result parity with the capped run, and that the exit never
    triggers when the cadence isn't materializing frames."""
    from dataflow_python_etl_spark.operators.graph import k_core

    # triangle {1,2,3} + pendant 3-4: cascade depth 1 (one peel
    # removes the pendant, the next confirms stability)
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src: long, dst: long"
    )
    stats = {}
    got = {
        r["node"]: r["core_degree"]
        for r in k_core(tri, k=2, rounds=16, stats=stats).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    assert stats == {"rounds_run": 2, "converged_early": True}

    # 5-node path under k=2 empties in 2 peels; exit confirms on the 3rd
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "src: long, dst: long"
    )
    stats = {}
    assert k_core(path, k=2, rounds=16, stats=stats).count() == 0
    assert stats == {"rounds_run": 3, "converged_early": True}

    # early_exit off: the full cap runs (result identical). 8 rounds,
    # not 16: rounds 4..8 are already pure no-op padding on this graph,
    # so the larger cap only added ~8 identical checkpoint jobs of
    # suite wall (optimization r12)
    stats = {}
    assert (
        k_core(path, k=2, rounds=8, early_exit=False, stats=stats).count() == 0
    )
    assert stats == {"rounds_run": 8, "converged_early": False}

    # no checkpoint cadence: nothing is materialized, so the exit
    # never counts an uncheckpointed (growing) plan — cap runs.
    # rounds=2, NOT more: each uncheckpointed round multiplies the
    # plan tree ~5x (the documented k_core growth), and Catalyst
    # analysis of the rounds=4 tree alone measured ~200 s of suite
    # wall (optimization r12) — 2 rounds proves the same property
    # (the path empties in 2 peels; the exit never fires)
    stats = {}
    assert (
        k_core(path, k=2, rounds=2, checkpoint_every=None, stats=stats).count()
        == 0
    )
    assert stats == {"rounds_run": 2, "converged_early": False}


def test_iterative_probes_ride_checkpoint_jobs(spark, monkeypatch):
    """Optimization-r12 convergence pin (guide §5, VERDICT r11 #3):
    the early-exit / termination counts of the iterative graph family
    are Observations riding the SAME Spark job that materializes each
    round's eager localCheckpoint — neither k_core nor
    components_contract may call DataFrame.count() on an intermediate
    frame (a separate count doubles the per-round job bill: q155
    measured 80 -> 60 jobs/run, q160 112 -> 95 at sf0.1). Results and
    early-exit behavior must be unchanged while the probe rides."""
    from pyspark.sql.classic import dataframe as classic

    from dataflow_python_etl_spark.operators.corpus import components_contract
    from dataflow_python_etl_spark.operators.graph import k_core

    calls: list[int] = []
    real_count = classic.DataFrame.count

    def counting(self):
        calls.append(1)
        return real_count(self)

    # patch the concrete class (Spark 4 shadows the base — CLAUDE.md)
    monkeypatch.setattr(classic.DataFrame, "count", counting)

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src: long, dst: long"
    )
    stats: dict = {}
    got = {
        r["node"]: r["core_degree"]
        for r in k_core(tri, k=2, rounds=16, stats=stats).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    assert stats == {"rounds_run": 2, "converged_early": True}
    assert not calls, "k_core ran a separate count() job per round"

    # two components + the termination probe on the contracted frame
    cc = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 11), (11, 12)], "src: long, dst: long"
    )
    labels = {
        r["node"]: r["cluster"] for r in components_contract(cc).collect()
    }
    assert labels == {3: 3, 5: 3, 9: 3, 11: 11, 12: 11, 20: 11}
    assert not calls, "components_contract ran a separate count() job"


def test_k_core_convergence_guard_and_validation(spark):
    """A peel that needs more rounds than granted must FAIL LOUDLY
    (filter-anchored raise_error), not return a non-core: a path of
    7 nodes peels from both ends — 3 rounds to empty under k=2."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from dataflow_python_etl_spark.operators.graph import k_core

    path = [(i, i + 1) for i in range(1, 7)]
    df = spark.createDataFrame(path, "src: long, dst: long")
    # enough rounds: converges to empty quietly
    assert k_core(df, k=2, rounds=3).count() == 0
    # starved rounds: guard fires
    with pytest.raises(SparkRuntimeException, match="did not converge"):
        k_core(df, k=2, rounds=1).count()
    # starved but unguarded: returns the (documented) non-fixpoint
    assert k_core(df, k=2, rounds=1, assert_converged=False).count() > 0
    with pytest.raises(ValueError, match="k must be"):
        k_core(df, k=0)
    with pytest.raises(ValueError, match="rounds"):
        k_core(df, k=2, rounds=0)


def test_core_communities_known_graph(spark):
    """Hand-computed modularity on planted structure: two disjoint
    triangles under k=2 are two communities with Q_c = 3/6 - (6/12)^2
    = 1/4 each (total 1/2, the two-equal-blocks textbook value);
    bridging them with one edge collapses the partition to ONE
    community whose modularity is exactly 0 (m_c = m); a path graph
    has an empty 2-core — no rows, no error."""
    from dataflow_python_etl_spark.operators.graph import core_communities

    tris = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]
    # pendant 6-7 peels out of the 2-core before labeling
    df = spark.createDataFrame(tris + [(6, 7)], "src: long, dst: long")
    rows = {r["community"]: r for r in core_communities(df, k=2).collect()}
    assert set(rows) == {1, 4}
    for c in (1, 4):
        assert rows[c]["n_nodes"] == 3
        assert rows[c]["m_intra"] == 3
        assert rows[c]["modularity_ppm"] == 250_000

    bridged = spark.createDataFrame(tris + [(3, 4)], "src: long, dst: long")
    out = core_communities(bridged, k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["community"], r["n_nodes"], r["m_intra"], r["modularity_ppm"]) == (
        1, 6, 7, 0,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "src: long, dst: long"
    )
    assert core_communities(path, k=2).count() == 0
