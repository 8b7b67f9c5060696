"""Graph analytics over edge DataFrames: PageRank — the canonical
iterative Spark workload (Page et al., 1999) beside the pointer-
jumping connected components in ``operators/corpus.py``.

Semantics (documented precisely so a SQL oracle can unroll them):
``rank_0(v) = 1/N``; each iteration
``rank_{k+1}(v) = (1 - d)/N + d · Σ_{(u,v)∈E} rank_k(u)/outdeg(u)``.
Dangling mass is NOT redistributed (the classic simplified variant —
ranks then sum to < 1 in graphs with sinks; monotone and convergent
all the same, and every engine computes the identical recurrence).

Scale shape: the edge set is the only large table. Each iteration is
one join of edges against the (node-sized) rank table on the source
key plus one map-side-combined sum on the destination — the same
partitioning every round, so a cluster run co-locates them after the
first shuffle. The rank table never exceeds |V| rows. Literal
arithmetic keeps the textual order ``(1 - d)/N + d * contrib`` on
both engines so doubles agree bit-for-bit per operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def checkpoint_count(df: DataFrame) -> tuple[DataFrame, int]:
    """Eager ``localCheckpoint`` that also returns the frame's row
    count, riding the SAME Spark job that materializes the checkpoint
    (a ``CollectMetrics`` observation populated by the checkpoint's
    internal count action) instead of a separate ``count()`` job.
    Per-round latency of the iterative operators is JOB SCHEDULING,
    not shuffle volume (measured ~0.1 s/job on node-sized frames at
    local[32]), so folding the convergence probe into the
    materialization action halves the per-round job count. Values are
    unchanged: the metrics node is a pass-through and the checkpointed
    rows are identical."""
    from pyspark.sql import Observation

    obs = Observation()
    chk = df.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    return chk, int(obs.get["n"])


def _maybe_checkpoint(df: DataFrame, step: int, every: int | None) -> DataFrame:
    """Truncate the iterated frame's lineage every ``every`` steps
    (1-based ``step``). ``localCheckpoint(eager=True)`` materializes
    the current state to executor storage and replaces the logical
    plan with a leaf — the standard cadence for deep iterative jobs
    where an unbounded plan tree bloats Catalyst analysis time and
    (on a real cluster) task-serialization size. Values are
    unchanged, only lineage; oracle rows stay bit-identical.
    ``None`` (the default) keeps full lineage — right for shallow
    fixed depths where re-computation-on-executor-loss matters more
    than plan size."""
    if every is not None and step % every == 0:
        return df.localCheckpoint(eager=True)
    return df


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank steps
    over the DISTINCT directed edge set. ``rank`` is rounded to 9
    places (ranks live at 1/N scale; 6 places would quantize away
    real structure at large N). ``checkpoint_every`` bounds plan
    depth for deep runs (see :func:`_maybe_checkpoint`)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if checkpoint_every is not None and checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    from dataflow_python_etl_spark.operators.dedup import register_cache

    # Pay the upstream distinct once, not per round. A registered
    # persist (not localCheckpoint): blocks are reclaimed by the
    # repo-wide unpersist_all() sweep between bench/certify trials,
    # and no eager job runs at plan-construction time. Lineage
    # truncation is not needed for `e` — only the iterated `ranks`
    # chain grows, which is fine at the default 3 iterations
    # (pass checkpoint_every for deep runs; docs/SCALE.md).
    e = register_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).alias("cnt"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("cnt")).alias("rank")
    )
    base = (F.lit(1.0) - F.lit(damping)) / F.col("cnt")
    for it in range(1, iterations + 1):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("d")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    base + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        ranks = _maybe_checkpoint(ranks, it, checkpoint_every)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def _orient(edges: DataFrame, src: str, dst: str):
    """Degree-ordered orientation shared by the triangle family:
    returns ``(e, deg, oriented)`` — the distinct undirected edge
    set, per-node degrees, and every edge oriented from its lower-
    ``(degree, node)`` endpoint ``u`` toward the higher ``v`` (with
    ``dv`` = v's degree carried for the wedge rank compare).

    ``e``, ``deg`` and ``oriented`` sit behind REGISTERED persists:
    each is consumed 2-3× (deg twice for the rank join, oriented
    three times as o1/o2/closing) and unregistered they re-derive
    the whole upstream edge fan-out per consumer — the q117 lesson,
    measured again on q138's plan. ``unpersist_all()`` reclaims
    them (bench does per trial)."""
    from dataflow_python_etl_spark.operators.dedup import register_cache

    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = register_cache(
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = register_cache(
        e.select(F.col("a").alias("n"))
        .union(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    ranked = (
        e.join(da, F.col("a") == F.col("da.n"))
        .join(db, F.col("b") == F.col("db.n"))
        .select("a", "b", F.col("da.d").alias("d_a"), F.col("db.d").alias("d_b"))
    )
    lower_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
    )
    oriented = register_cache(
        ranked.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("d_b")).otherwise(F.col("d_a")).alias("dv"),
        )
    )
    return e, deg, oriented


def _wedges(oriented: DataFrame) -> DataFrame:
    """The apex self-join — the heaviest shuffle in the repo (q87/
    q138). Join key is the apex node ``u``; the orientation bounds
    apex out-degree at O(√m), but a residual hot apex is exactly the
    shape AQE skew-join splits (measured pin:
    ``tests/test_graph_anomaly.py::test_wedge_join_hot_apex_skew_split``)."""
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    return o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (
            (F.col("o1.dv") < F.col("o2.dv"))
            | ((F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v")))
        ),
    ).select(
        F.col("o1.u").alias("w_u"), F.col("o1.v").alias("x"), F.col("o2.v").alias("y")
    )


def _oriented_triangles(edges: DataFrame, src: str, dst: str):
    """Shared Suri-Vassilvitskii (2011) triangle enumeration used by
    :func:`triangle_count` (global count, q87) and
    :func:`clustering_coefficients` (per-node, q138) — one
    implementation so the orientation/tie-break contract cannot
    desynchronize between the two. Returns ``(e, deg, tri)`` where
    ``tri`` has one row per triangle as ``(w_u, x, y)`` (apex, then
    the two higher-rank corners)."""
    e, deg, oriented = _orient(edges, src, dst)
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = _wedges(oriented).join(closing, ["x", "y"])
    return e, deg, tri


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of the UNDIRECTED graph under ``edges``
    (direction and duplicates ignored, self-loops dropped) — one row
    ``(n_nodes, n_edges, n_triangles)``. The standard clustering /
    community signal beside PageRank and connected components.

    Degree-ordered orientation (the classic MapReduce triangle
    algorithm, Suri & Vassilvitskii 2011): orient every undirected
    edge from its lower-``(degree, node)`` endpoint to the higher, so
    each triangle is counted EXACTLY once from its lowest-rank apex
    and — the scale property — wedge volume is Σ out-deg², with
    orientation bounding out-degree at O(√m) even on power-law
    graphs: a celebrity node of degree 10⁶ generates no wedges at its
    apex because nearly all its edges point INTO it. Three shuffles
    total (degree agg, wedge self-join, closing-edge join); every
    join key is a node id, never an unbounded attribute.

    Exact, so the DuckDB oracle (q87) runs the identical algorithm;
    rank ties break by node id, making the orientation — and each
    intermediate — deterministic cross-engine.
    """
    e, deg, tri = _oriented_triangles(edges, src, dst)
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    counts = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    ).crossJoin(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    return counts.crossJoin(n_tri).select("n_nodes", "n_edges", "n_triangles")


def k_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    rounds: int = 16,
    checkpoint_every: int | None = 1,
    assert_converged: bool = True,
    early_exit: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """``(node, core_degree)`` — the k-CORE of the UNDIRECTED graph
    under ``edges`` (direction/duplicates ignored, self-loops
    dropped): the maximal induced subgraph in which every node has
    degree ≥ ``k`` (Seidman 1983; the standard community-density /
    graph-degeneracy primitive beside the triangle family).

    Iterative peel, run for EXACTLY ``rounds`` synchronous steps so a
    SQL oracle can unroll the identical loop (the PageRank
    discipline): each step computes induced degrees, keeps nodes with
    degree ≥ k, and drops edges touching a peeled node. Peeling is
    monotone — once the fixpoint is reached every further round is a
    no-op on the (by then core-sized) edge set, so a generous
    ``rounds`` costs little; ``assert_converged`` guards the fixpoint
    with a raise_error FILTER on the output degrees (all ≥ k ⟺ one
    more peel would remove nothing — if it fires, raise ``rounds``).
    The cascade depth is graph-dependent: measured 3/6/9 rounds on
    the sparsified co-purchase graph at sf0.001/0.01/0.1 (q155), so
    the default 16 carries ~2× margin.

    Scale shape: each round is one map-side-combined degree agg plus
    two semi-joins on node ids, all partitioned the same way, so a
    cluster run co-locates them after the first shuffle; the frame
    only ever SHRINKS. Integer degrees — no float discipline needed.

    Plan-growth warning (the bfs_hops class, worse): every round
    references the PRIOR edge frame five times (twice in the degree
    union, twice more through ``keep``'s two semi-join sides, once as
    the filtered frame), so an uncheckpointed plan tree grows ~5× per
    round — 16 rounds without truncation hangs Catalyst outright
    (measured). ``checkpoint_every`` therefore defaults to 1: eager
    localCheckpoint per round, each round's plan O(1) over a leaf.

    ``early_exit`` (default on) rides a ``count()`` on the frame the
    round just localCheckpointed (the round-5 "ride the action you
    already run" rule — the count is a cheap job over materialized
    blocks, never a plan re-execution, so it only fires on
    checkpoint rounds): peeling removes edges monotonically, so an
    UNCHANGED edge count proves every remaining node has degree ≥ k
    and the loop stops — typical cost drops from the fixed ``rounds``
    cap (16) to cascade-depth+1 (measured 3/6/9 on q155's graph at
    the three SFs) while ``rounds`` stays the hard cap and a fixed-
    unroll SQL oracle stays valid (post-fixpoint rounds are no-ops).
    ``stats`` (optional dict) receives ``rounds_run`` and
    ``converged_early`` for pinning measured rounds == cascade depth.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from dataflow_python_etl_spark.operators.dedup import register_cache

    e = register_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )

    def _deg(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("src").alias("node"))
            .unionAll(ed.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        )

    prev_n = None
    rounds_run = 0
    converged_early = False
    for r in range(1, rounds + 1):
        keep = _deg(e).where(F.col("core_degree") >= k).select("node")
        e = e.join(
            keep.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        rounds_run = r
        fire = checkpoint_every is not None and r % checkpoint_every == 0
        # probe only frames the cadence just materialized — counting
        # an uncheckpointed frame would re-run the growing plan. The
        # count RIDES the checkpoint job (checkpoint_count), so an
        # early-exiting round costs ONE job, not checkpoint + count
        # (optimization r12, guide §5 driver/scheduling overhead).
        if early_exit and fire:
            e, n = checkpoint_count(e)
            if n == prev_n:
                converged_early = True
                break
            prev_n = n
        else:
            e = _maybe_checkpoint(e, r, checkpoint_every)
    if stats is not None:
        stats["rounds_run"] = rounds_run
        stats["converged_early"] = converged_early
    out = _deg(e)
    if assert_converged:
        out = out.where(
            F.when(
                F.col("core_degree") < k,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"k_core did not converge in {rounds} rounds "
                            f"(k={k}): node "
                        ),
                        F.col("node").cast("string"),
                        F.lit(" still has degree "),
                        F.col("core_degree").cast("string"),
                        F.lit(" — increase rounds"),
                    ),
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    return out.select("node", "core_degree")


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
    checkpoint_every: int | None = 4,
) -> DataFrame:
    """Breadth-first reach from a seed set over the UNDIRECTED graph
    under ``edges``: ``(hop, n_nodes)`` — how many nodes first become
    reachable at each hop ≤ ``max_hops`` (hop 0 = the distinct seeds
    themselves). The "blast radius" readout behind contamination
    spread, fraud-ring expansion, and recall-set sizing.

    Level-synchronous frontier iteration — the BFS formulation that
    shards: each round is ONE node-keyed join of the frontier against
    the (cached, symmetrized) edge set + a distinct + an anti-join
    against the visited set, so per-round cost is the frontier's
    adjacency, never the whole graph re-walked. All set arithmetic on
    ids — no floats anywhere, so the DuckDB oracle is a recursive CTE
    whose ``min(hop)`` per node provably equals the BFS distance
    (every ≤ max_hops walk is enumerated; dedup on (node, hop) bounds
    CTE state at (max_hops+1)·|V| rows). Lineage is NOT linear here:
    each hop's frontier references both the previous frontier and the
    previous visited set, so the plan TREE grows ~3× per hop —
    measured 1.2 MB of analyzed-plan string by hop 10, and the
    driver OOMs formatting the execution description long before any
    data is large. ``checkpoint_every`` (default 4 — a no-op at the
    shallow depths the registered queries use, a hard bound on plan
    size for deep traversals) localCheckpoints both iterated frames
    on cadence; values are unchanged, only lineage.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    if checkpoint_every is not None and checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    from dataflow_python_etl_spark.operators.dedup import register_cache

    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    e = register_cache(fwd.union(rev).where(F.col("u") != F.col("v")).distinct())
    visited = seeds.select(F.col(seed_col).alias("node")).distinct().select(
        "node", F.lit(0).alias("hop")
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(h).alias("hop"))
        )
        # On cadence, truncate BOTH iterated chains: the frontier's
        # lineage references the previous frontier AND the previous
        # visited set, so its plan tree grows ~3× per hop — measured
        # 1.2 MB of analyzed-plan STRING by hop 10 untruncated, which
        # OOMs the driver formatting the execution description long
        # before the data is large. Checkpointing visited alone
        # leaves the frontier chain exponential.
        nxt = _maybe_checkpoint(register_cache(nxt), h, checkpoint_every)
        visited = _maybe_checkpoint(visited.union(nxt), h, checkpoint_every)
        frontier = nxt.select("node")
    return visited.groupBy("hop").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


def weighted_shortest_paths(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    max_hops: int = 4,
) -> DataFrame:
    """Single-source shortest paths with ≤ ``max_hops`` edges
    (bounded Bellman-Ford): ``(node, d)`` for every node reachable
    from ``source``, minimizing total integer weight.

    Each relaxation round joins the current distance table against
    the BROADCAST edge list and keeps the per-node minimum — after
    round k, ``d`` is exactly the cheapest walk using ≤ k edges, so
    the DuckDB oracle (a hop-bounded recursive CTE enumerating walks)
    provably agrees; the hop bound also makes zero-weight cycles
    finite. Designed for VOCABULARY-SIZED graphs derived from fact
    tables (event-type transition graphs, entity-category graphs):
    the fact-sized work is deriving the edges upstream, the
    relaxation is |V|·rounds small. For edge lists too big to
    broadcast, drop to a shuffled join by removing the hint — same
    algebra, and the distance table stays ≤ |V| rows either way.
    Integer weights only — summing engine-private floats across
    different path orders is exactly the cross-engine trap the
    count/sum rule exists for.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    from dataflow_python_etl_spark.operators.dedup import register_cache

    # Pay the (possibly fact-sized) edge derivation ONCE: without the
    # registered persist, every relaxation round's broadcast re-runs
    # the upstream lineage — k full fact scans instead of one
    # (caught by tests/test_plans.py::test_fastest_paths_fact_scanned_once).
    e = register_cache(
        edges.select(
            F.col(src).alias("__s"), F.col(dst).alias("__t"),
            F.col(weight_col).cast("long").alias("__w"),
        )
    )
    dist = e.sparkSession.createDataFrame(
        [(source, 0)], "node " + e.schema["__s"].dataType.simpleString() + ", d long"
    )
    for _ in range(max_hops):
        relax = (
            dist.join(F.broadcast(e), dist["node"] == e["__s"])
            .select(F.col("__t").alias("node"), (F.col("d") + F.col("__w")).alias("d"))
        )
        dist = dist.unionAll(relax).groupBy("node").agg(F.min("d").alias("d"))
    return dist


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient — ``cc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1))`` with T(v) the triangles through v — the
    node-grain companion of :func:`triangle_count` (same Suri-
    Vassilvitskii degree-ordered orientation, same determinism
    contract). Nodes of degree < 2 have no defined coefficient and
    are dropped. Returns ``(node, degree, n_triangles, cc_ppm)``
    with the coefficient in half-up integer ppm (one positive-
    operand division through DECIMAL — 4·10⁶·T(v) brushes int64 at
    hub degrees).

    Scale shape: identical to triangle_count (degree agg, wedge
    self-join bounded Σ out-deg² = O(m^1.5), closing-edge join) plus
    one |triangles|×3 explode and a node-keyed count — the shared
    cached :func:`_oriented_triangles` enumeration."""
    from dataflow_python_etl_spark.operators.sketches import _int_div, dec38

    _, deg, tri = _oriented_triangles(edges, src, dst)
    per_node = (
        tri.select(F.explode(F.array("w_u", "x", "y")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    d_, t_ = F.col("d").cast("long"), F.coalesce(F.col("t"), F.lit(0)).cast("long")
    pairs2 = dec38(d_) * dec38(d_ - 1)  # 2 × the wedge count at v
    return (
        deg.where(F.col("d") >= 2)
        .join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            d_.alias("degree"),
            t_.alias("n_triangles"),
            _int_div(
                dec38(F.lit(4_000_000)) * dec38(t_) + pairs2,
                dec38(F.lit(2)) * pairs2,
            )
            .cast("long")
            .alias("cc_ppm"),
        )
    )


def core_communities(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    rounds: int = 16,
    max_iterations: int = 32,
) -> DataFrame:
    """Community assignment + exact-integer modularity over the
    k-CORE of the undirected graph under ``edges`` — deterministic
    label propagation done the oracle-able way (SURVEY §8.3): the
    classic mode-update LPA is tie-break-nondeterministic, so the
    community rule here is MIN-LABEL flood to fixpoint (=) connected
    components) RESTRICTED to the k-core subgraph. Peeling first
    removes the low-degree periphery that makes whole-graph
    components collapse into one giant blob, so the surviving dense
    cores are the communities a mode-LPA would find on such graphs —
    with a unique, engine-independent fixpoint (min reachable id).

    Returns one row per community:
    ``(community, n_nodes, m_intra, modularity_ppm)`` where
    ``community`` is the min node id, ``m_intra`` the induced
    intra-community edge count, and ``modularity_ppm`` the
    community's contribution to Newman-Girvan modularity
    ``Q_c = m_c/m − (d_c/2m)²`` in integer ppm:

        term1 = (10⁶·m_c) div m
        r_c   = (10⁶·d_c) div (2m)          -- ≤ 10⁶ by construction
        Q_ppm = term1 − (r_c·r_c) div 10⁶

    Two-stage division instead of the single-division form
    ``10⁶·(4·m·m_c − d_c²) div (4m²)``: the latter is exact but its
    numerator wraps int64 at m ≈ 5·10⁷ edges, while here every
    intermediate is bounded by ``10⁶·d_c ≤ 2·10⁶·m < 2⁶³``, i.e. up
    to m ≈ 4.6·10¹² edges (``d_c`` can reach ``2m``) — the 100 TB
    regime. Past that bound Spark would silently wrap while DuckDB
    promotes to INT128, so a filter-anchored ``raise_error`` guard on
    ``m`` (the DSIR weight-table pattern) fails loudly instead. Both
    engines replay the identical floor divisions, so the ±1 ppm
    quantization of term2 is bit-reproducible
    (portable-by-construction, like the DSIR linearization; the
    oracle runs the same three divisions).

    A component partition has NO inter-community edges, so
    ``d_c = 2·m_c`` exactly and ``m_intra`` is derived as
    ``d_sum div 2`` from the core degrees :func:`k_core` already
    returns — no second edge-sized shuffle.

    Scale shape: one :func:`k_core` peel (early-exiting), two
    semi-joins to induce the core edge set, MIN-CONTRACTION
    components
    (:func:`~dataflow_python_etl_spark.operators.corpus.
    components_contract` — ~O(log n) rounds over a geometrically
    SHRINKING contracted edge frame, loud past ``max_iterations``
    rounds), and one community-sized agg. Everything keys on node
    ids.

    The first draft used dup_clusters' jump+min flood here and
    MEASURED 25-32 rounds to fixpoint at sf0.01 (the pointer jump is
    NOT O(log diameter) — a node's label is the min of its r-ball,
    and that min's own ball need not extend the frontier; community
    graphs are exactly the chained-blob workload that exposes it).
    Contraction replaces the diameter bound with a halving argument;
    dup_clusters keeps the flood for its small-diameter near-dup
    cluster graphs (q48)."""
    from dataflow_python_etl_spark.operators.corpus import components_contract
    from dataflow_python_etl_spark.operators.dedup import register_cache

    # canonicalize ONCE and feed the cached frame to k_core — its
    # internal distinct then runs over cached blocks instead of
    # re-deriving the (possibly expensive) upstream edge fan-out a
    # second time (q160's co-purchase explode, measured)
    canon = register_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    core = k_core(canon, k=k, rounds=rounds)
    core_nodes = core.select("node")
    induced = register_cache(
        canon.join(
            core_nodes.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(core_nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
    )
    labels = components_contract(induced, max_rounds=max_iterations).select(
        "node", F.col("cluster")
    )
    m_row = induced.agg(F.count(F.lit(1)).cast("long").alias("m"))
    comm = (
        core.join(labels, "node")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("core_degree").cast("long").alias("d_sum"),
        )
    )
    # filter-anchored overflow guard (CLAUDE.md: a dead projected column
    # would be pruned): 1e6*d_sum with d_sum <= 2m wraps int64 once
    # m > (2^63-1) div 2e6 ~ 4.6e12 edges — fail loudly, don't wrap.
    _long_max = 9223372036854775807
    return (
        comm.crossJoin(F.broadcast(m_row))
        .where(
            F.when(
                F.expr(f"m > {_long_max} div 2000000"),
                F.raise_error(
                    F.concat(
                        F.lit("core_communities: 1000000*d_sum would exceed "),
                        F.lit("the 64-bit bound at m="),
                        F.col("m").cast("string"),
                        F.lit(" edges (limit ~4.6e12) — shard the graph or "),
                        F.lit("widen the arithmetic before computing "),
                        F.lit("modularity"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .select(
            F.col("cluster").alias("community"),
            "n_nodes",
            F.expr("d_sum div 2").cast("long").alias("m_intra"),
            F.expr(
                "(1000000 * (d_sum div 2)) div m - "
                "(((1000000 * d_sum) div (2 * m)) * "
                "((1000000 * d_sum) div (2 * m))) div 1000000"
            )
            .cast("long")
            .alias("modularity_ppm"),
        )
    )
