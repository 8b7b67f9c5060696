"""End-to-end training-corpus cleaning pipeline — the composition the
individual operators exist for (BASELINE.json north star).

``clean_corpus``: quality-gate → near-dup removal → per-doc stats,
entirely as one lazy DataFrame graph (the stages fuse where Catalyst
allows; nothing materializes until the sink).

``dup_clusters``: connected components over the near-dup pair graph
via iterative min-label propagation — the canonical "iterative
algorithm" Spark pattern (loop of joins with localCheckpoint to cut
the growing lineage). Used when near-dup chains (a~b, b~c) must
collapse to one survivor per CLUSTER rather than per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataflow_python_etl_spark.functions.text import quality_score, token_count
from dataflow_python_etl_spark.operators.dedup import ngram_jaccard_pairs, register_cache


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    n: int = 3,
    max_shingle_df: int | None = 64,
) -> DataFrame:
    """Survivors of quality gating + pairwise near-dup removal.

    Near-dup rule: among each near-dup pair (a < b), the larger id is
    removed — deterministic, keeps the earliest document, and mirrors
    exactly into the SQL oracle. (For chain-collapsing cluster
    semantics use :func:`dup_clusters`.)

    ``max_shingle_df`` (ON by default) drops shingles shared by more
    than that many documents before the pair join — one boilerplate
    shingle on a crawl corpus otherwise produces O(df²) candidate
    pairs. The removal set is NOT broadcast-hinted: its cardinality
    scales with the corpus duplication rate, so a hard hint would be a
    driver OOM at 100 TB; AQE broadcasts it dynamically when small.
    Returns (id, n_tokens, quality).
    """
    # The gated projection feeds two consumers (the shingle/pair
    # pipeline and the final survivor projection); without a
    # materialization barrier the regex-heavy quality_score tree is
    # evaluated twice over the full corpus (CollapseProject folds a
    # withColumn back into both branches). persist() is the barrier —
    # MEMORY_AND_DISK, the same stage a 100 TB pipeline would
    # checkpoint to the lake between gating and pairing. Lives until
    # session end (same policy as the dedup operators' internal
    # caches, registered for the same unpersist_all() sweep bench and
    # long-lived services use; see docs/SCALE.md known trade-offs).
    scored = register_cache(
        docs.select(
            F.col(id_col),
            F.col(text_col),
            quality_score(text_col).alias("quality"),
        ).where(F.col("quality") >= min_quality)
    )
    pairs = ngram_jaccard_pairs(
        scored, id_col=id_col, text_col=text_col, n=n,
        threshold=jaccard_threshold, max_shingle_df=max_shingle_df,
    )
    removals = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return (
        scored.join(removals, id_col, "left_anti")
        .select(
            F.col(id_col),
            token_count(text_col).cast("long").alias("n_tokens"),
            F.col("quality"),
        )
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 20,
    probe_every: int = 1,
) -> DataFrame:
    """Connected components of the near-dup pair graph.

    Min-label propagation with pointer jumping: every node starts
    labeled with itself; each round, every node first adopts its
    label's label (the pointer jump), then adopts the minimum label
    in its neighborhood. The jump ACCELERATES propagation but is NOT
    the textbook O(log diameter) — a node's label is the min id of
    its r-ball, and that min's own ball need not extend the frontier
    (measured on q160's chained-block graph: 25-32 rounds at
    diameter ~10², where doubling theory predicted ~8). The
    convergence probe is what bounds the loop; long-diameter
    components belong on :func:`components_contract` instead (what
    core_communities uses) — this flood stays for the small-diameter
    near-dup cluster graphs it was built for (q48).
    ``localCheckpoint`` truncates the lineage so the plan doesn't grow
    with the iteration count; the symmetrized edge set is checkpointed
    once so the (possibly expensive) upstream pair plan is never
    re-evaluated per round. The convergence probe rides the same job
    that materializes the round's checkpoint — one Spark job per
    ``probe_every`` rounds: JOB SCHEDULING, not shuffle volume,
    dominates iterative latency on node-sized label tables (measured
    ~2.7 s/round on q160's first-draft flood at sf0.01), so a caller
    expecting a deep flood MAY batch rounds between probes (worst
    case overshoots the fixpoint by probe_every−1 no-op rounds).
    CAVEAT, measured: each batched round references the prior lazy
    checkpoint 3x, and within ONE probe job the uncached references
    recompute — probe_every=4 made q160's flood 5x SLOWER, not
    faster. Batching only pays when rounds are cheap relative to job
    overhead AND the batch is shallow (2); deep-diameter callers
    should use components_contract instead (O(log n) rounds over a
    shrinking frame), which is what core_communities does now.

    Raises ``RuntimeError`` if no fixpoint is reached within
    ``max_iterations``: partially propagated labels would silently
    split real clusters, so the failure is loud instead.

    Returns (node, cluster) where cluster is the min node id reachable.
    """
    if probe_every < 1:
        raise ValueError(f"probe_every must be >= 1, got {probe_every}")
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
    )
    converged = False
    for _it in range(1, max_iterations + 1):
        # pointer jump first, over the (checkpointed, node-sized)
        # label table — cluster ids are node ids, so the self-join
        # always finds a row; evaluating this side of the diamond
        # twice only re-reads checkpoint blocks, never recomputes
        # the expensive neighbor aggregation
        jump = labels.select(
            F.col("node").alias("pj_node"), F.col("cluster").alias("pj_cluster")
        )
        jumped = labels.join(jump, labels.cluster == jump.pj_node, "left").select(
            "node",
            F.col("cluster").alias("prev"),
            F.least(
                F.col("cluster"), F.coalesce(F.col("pj_cluster"), F.col("cluster"))
            ).alias("cluster"),
        )
        # neighbor labels: for each node, the min label among neighbors
        neighbor_min = (
            edges.join(jumped, edges.dst == jumped.node)
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_min"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            jumped.join(neighbor_min, "node", "left")
            .select(
                "node",
                "prev",
                F.least(F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))).alias(
                    "cluster"
                ),
            )
            .localCheckpoint(eager=False)
        )
        # one action per probe_every rounds: materializes the lazy
        # checkpoints of the whole batch AND answers "did the LAST
        # round change anything" from the carried prev column (prev
        # is that round's starting label, catching jump as well as
        # propagation changes; a no-op round implies fixpoint — the
        # update is monotone, so every later round is a no-op too)
        labels = new_labels.select("node", "cluster")
        if _it % probe_every == 0 or _it == max_iterations:
            changed = (
                new_labels.where(F.col("cluster") != F.col("prev"))
                .limit(1)
                .count()
            )
            if changed == 0:
                converged = True
                break
    if not converged:
        raise RuntimeError(
            f"dup_clusters: no fixpoint after {max_iterations} iterations "
            "(component diameter exceeds the cap); raise max_iterations"
        )
    return labels


def components_contract(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 32,
) -> DataFrame:
    """Connected components by MIN-CONTRACTION — the scale-path CC
    primitive beside :func:`dup_clusters`' jump+min flood. The flood
    converges in ~diameter rounds (the pointer jump accelerates but
    is NOT O(log) — measured 25-32 rounds on q160's chained-block
    graph, docstring there), which at 100 TB graph diameters is the
    wrong asymptotic. Contraction is the classic fix (the
    large-star/small-star family, Kiveris et al. 2014, in its
    deterministic min-hooking form):

    each round (1) every current PARENT adopts its minimum adjacent
    parent in the CONTRACTED graph (hook), (2) one pointer-
    compression step ``p ← p(p)``, (3) the contracted edge set is
    rewritten onto the new parents and self-edges drop. A path of k
    roots halves per round (root i hooks to i−1, pairs contract), so
    rounds are ~O(log n) and — unlike the flood — the edge frame
    SHRINKS geometrically: the round cost follows the contracted
    graph, not the input.

    Termination: the contracted edge set is EMPTY ⟺ p is equal on
    the endpoints of every original edge ⟺ p is constant per
    component; parents only ever decrease and the component minimum
    never adopts (nothing is smaller), so that constant is exactly
    the min node id — the same label :func:`dup_clusters` and the
    q48/q160 recursive-CTE oracles define. Loud RuntimeError at the
    cap (a silently partial contraction would split clusters).

    Returns (node, cluster), cluster = min reachable node id.
    Direction/duplicate edges and self-loops are ignored."""
    from dataflow_python_etl_spark.operators.graph import checkpoint_count

    # the contracted-edge count that decides termination RIDES the job
    # that materializes each round's checkpoint (checkpoint_count —
    # optimization r12): per-round jobs drop from 3 (count + p
    # checkpoint + ce checkpoint) to 2, and the initial probe rides
    # the initial edge checkpoint. Values unchanged.
    e, n_ce = checkpoint_count(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    p = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .distinct()
        .withColumn("p", F.col("node"))
        .localCheckpoint(eager=True)
    )
    ce = e
    converged = False
    for _ in range(max_rounds):
        if n_ce == 0:
            converged = True
            break
        sym = ce.select(F.col("a").alias("r"), F.col("b").alias("s")).unionAll(
            ce.select(F.col("b").alias("r"), F.col("a").alias("s"))
        )
        hook = (
            sym.groupBy("r")
            .agg(F.min("s").alias("m"))
            .where(F.col("m") < F.col("r"))
        )
        p = p.join(hook, p.p == hook.r, "left").select(
            "node", F.coalesce("m", "p").alias("p")
        )
        comp = p.select(F.col("node").alias("n2"), F.col("p").alias("p2"))
        p = (
            p.join(comp, p.p == comp.n2, "left")
            .select("node", F.coalesce("p2", "p").alias("p"))
            .localCheckpoint(eager=True)
        )
        pa = p.select(F.col("node").alias("a"), F.col("p").alias("pa"))
        pb = p.select(F.col("node").alias("b"), F.col("p").alias("pb"))
        ce, n_ce = checkpoint_count(
            ce.join(pa, "a")
            .join(pb, "b")
            .where(F.col("pa") != F.col("pb"))
            .select(
                F.least("pa", "pb").alias("a"), F.greatest("pa", "pb").alias("b")
            )
            .distinct()
        )
    if not converged:
        raise RuntimeError(
            f"components_contract: contracted edges remain after "
            f"{max_rounds} rounds; raise max_rounds"
        )
    return p.select("node", F.col("p").alias("cluster"))


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    order_cols: list[str],
    salt_buckets: int | None = None,
) -> DataFrame:
    """At most ``n`` rows per key — the per-domain quota step of
    corpus curation (no single crawl domain may dominate the corpus).

    Deterministic: survivors are the first ``n`` by ``order_cols``
    (pass an id column last for a total order).

    Default (``salt_buckets=None``): one shuffle on the key; Spark's
    WindowGroupLimit pushes the rank filter map-side, so only ~n rows
    per key per input partition reach the exchange. A pathologically
    hot key (one domain = 90% of a crawl) still lands on ONE reducer,
    which at 100 TB is a straggler/spill.

    ``salt_buckets=S`` selects the two-phase variant for that case:

    1. pre-rank within ``(key, salt)`` where salt = content hash of
       ``order_cols`` mod S — the hot key spreads over S reducers,
       each emitting at most ``n`` rows;
    2. global re-rank within the key over the ≤ n·S survivors.

    Identical output to the single-phase form: any row in a key's
    global top-n is a fortiori in the top-n of its salt bucket (every
    row ranked above it globally that shares its bucket is ranked
    above it there too), so phase 1 never drops a survivor. The second
    shuffle is bounded at n·S rows per key regardless of input skew.
    Salt is content-derived (not random) so the plan stays
    deterministic and re-runnable."""
    from pyspark.sql import Window

    order = [F.col(c) for c in order_cols]
    if salt_buckets is not None:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets)
        )
        w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order)
        df = (
            df.withColumn("__salt", salt)
            .withColumn("__rn", F.row_number().over(w1))
            .where(F.col("__rn") <= n)
            .drop("__rn", "__salt")
        )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def split_by_group(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    seed: str = "split-v1",
) -> DataFrame:
    """Leakage-proof train/val/test assignment: adds a ``split``
    column where every row of a group lands in the SAME split, chosen
    by the portable md5 hash of the group key.

    Row-level random splits leak near-duplicates across train and
    eval; pass a duplicate-cluster id (:func:`dup_clusters`), a domain
    (``url_domain``), or any contamination boundary as ``group_col``
    and the whole group moves together. Deterministic across runs,
    partitionings, and engines (md5 — same family as the dedup
    operators), zero-shuffle (pure map-side projection), and stable
    under corpus growth: a group's split never changes when other
    groups are added, because assignment depends only on the group key
    and ``seed``.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    from dataflow_python_etl_spark.functions.text import md5_hash60

    # uniform in [0, 1): 60-bit portable hash of (seed ++ key)
    u = md5_hash60(
        F.concat(F.lit(seed + ":"), F.col(group_col).cast("string"))
    ) / F.lit(float(1 << 60))
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def kfold_by_group(
    df: DataFrame,
    group_col: str,
    k: int,
    seed: str = "kfold-v1",
) -> DataFrame:
    """Leakage-proof k-fold cross-validation assignment: adds a
    ``fold`` column (long in ``[0, k)``) where every row of a group
    lands in the SAME fold — the k-way sibling of
    :func:`split_by_group` (fold ``i``'s eval set is the group-closed
    complement of its train set, the property row-level folds break
    by scattering near-duplicates across folds).

    ``fold = md5(seed ++ group) mod k``: deterministic across runs,
    partitionings, and engines; zero-shuffle map-side projection; and
    stable under corpus growth — adding groups never moves an
    existing group's fold, so fold-``i`` model artifacts stay valid
    across corpus refreshes. Fold sizes are statistically uniform
    over groups (exact balance would need a global rank shuffle and
    would break growth-stability).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from dataflow_python_etl_spark.functions.text import md5_hash60

    return df.withColumn(
        "fold",
        F.pmod(
            md5_hash60(F.concat(F.lit(seed + ":"), F.col(group_col).cast("string"))),
            F.lit(k),
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: str = "strat-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus REBALANCING
    step (downsample the dominant language/domain, keep the tail):
    each row survives iff ``u(key) < rates[stratum]``, where ``u`` is
    the portable 60-bit md5 hash of ``(seed, key)`` mapped to [0, 1).

    Zero-shuffle map plan (one hash + one CASE per row — safe over
    every byte at 100 TB), reproducible across engines/runs/
    partitionings (same md5 family as :func:`split_by_group` — the
    DuckDB oracle mirrors it exactly), and stable under corpus
    growth: a row's fate depends only on its key, stratum, and seed.
    Unlike ``df.sampleBy``, which draws from a per-partition RNG
    stream and changes membership whenever partitioning changes, this
    is content-addressed. Strata absent from ``rates`` fall back to
    ``default_rate`` (0 = drop — allowlist semantics).
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    from dataflow_python_etl_spark.functions.text import md5_hash60

    u = md5_hash60(
        F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))
    ) / F.lit(float(1 << 60))
    rate = None
    for name, r in rates.items():
        branch = F.when(F.col(strata_col) == name, F.lit(r))
        rate = branch if rate is None else rate.when(F.col(strata_col) == name, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.where(u < rate)


def epoch_upsample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    seed: str = "epoch-v1",
) -> DataFrame:
    """Deterministic epoch-weighted replication — the training-mixture
    step AFTER rebalancing decides rates: a stratum with weight 2.5
    contributes every document twice plus a content-addressed 50% of
    documents a third time ("4 epochs of Wikipedia, 0.3 epochs of
    crawl" mixes are how LLM training runs weight their sources;
    weights < 1 degenerate to :func:`stratified_sample`).

    Each output row carries an ``epoch`` column (0-based replica
    index) so downstream shuffling/packing can keep replicas apart.
    The fractional replica is selected by the portable 60-bit md5 of
    ``(seed, key)`` — the same content-addressed family as
    :func:`stratified_sample`, so membership is identical across
    engines, runs, and partitionings, and a document's replica count
    never changes when other documents are added.

    Zero-shuffle map + explode fan-out: output volume is the weighted
    sum of stratum sizes — exactly what the mixture asked for — and
    no RNG state, no driver participation, safe at 100 TB.
    """
    for k, w in weights.items():
        if w < 0.0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {w}")
    if default_weight < 0.0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")
    from dataflow_python_etl_spark.functions.text import md5_hash60

    u = md5_hash60(
        F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))
    ) / F.lit(float(1 << 60))
    w = None
    for name, r in weights.items():
        branch = F.when(F.col(strata_col) == name, F.lit(float(r)))
        w = branch if w is None else w.when(F.col(strata_col) == name, F.lit(float(r)))
    w = F.lit(float(default_weight)) if w is None else w.otherwise(F.lit(float(default_weight)))
    n = (F.floor(w) + F.when(u < w - F.floor(w), F.lit(1)).otherwise(F.lit(0))).cast(
        "int"
    )
    # sequence(0, stop) DESCENDS for stop < 0 (the lm.py pitfall):
    # guard n >= 1 and let explode drop the empty arrays
    replicas = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(replicas))


def semantic_dedup(
    docs: DataFrame,
    embeddings: DataFrame,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-cosine near-dup removal: documents whose embeddings
    sit within ``threshold`` cosine of an earlier document are dropped
    (the lower id of each near-dup pair survives — same deterministic
    survivor rule as :func:`clean_corpus`).

    This is the semantic tier of the dedup family: n-gram Jaccard
    catches copy-edits, MinHash scales it, SimHash compresses it —
    embedding cosine catches PARAPHRASES none of those see. Candidate
    pairs come from random-hyperplane LSH buckets
    (:func:`~dataflow_python_etl_spark.operators.similarity.cosine_pairs_lsh`),
    so the corpus never goes through an all-pairs join, and the
    removal set is not broadcast-hinted (its size scales with the
    duplication rate; AQE broadcasts it when actually small).
    """
    from dataflow_python_etl_spark.operators.similarity import cosine_pairs_lsh

    pairs = cosine_pairs_lsh(
        embeddings, threshold=threshold, id_col=emb_id_col, vec_col=vec_col
    )
    removals = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(removals, id_col, "left_anti")


def gopher_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_fraction: float = 0.8,
    min_stop_kinds: int = 2,
    max_ellipsis_fraction: float = 0.3,
    max_bullet_fraction: float = 0.9,
    max_dup_line_fraction: float = 0.3,
) -> DataFrame:
    """Per-document Gopher quality-rule evaluation (Rae et al. 2021,
    appendix A1 — the published rule-based filter every large English
    corpus pipeline starts from; thresholds are the paper's defaults
    and all overridable per workload).

    Unlike :func:`~dataflow_python_etl_spark.functions.text.quality_score`
    (a soft composite for ranked gating), this is the hard rule set:
    each rule is its own boolean column so a pipeline can report WHY a
    document failed (the reference's monitoring tables want per-rule
    reject counts), plus the conjunction ``passes``.

    One zero-shuffle JVM projection — every signal is an expression
    tree over one tokenization, so the full rule set costs a single
    map over the corpus and is safe on every byte at 100 TB. Rule
    comparisons run on the exact integer-ratio doubles (bit-identical
    cross-engine); reported metric columns are rounded to 6 places.
    """
    metrics, rules = _gopher_exprs(
        text_col,
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_ratio=max_symbol_ratio,
        min_alpha_fraction=min_alpha_fraction,
        min_stop_kinds=min_stop_kinds,
        max_ellipsis_fraction=max_ellipsis_fraction,
        max_bullet_fraction=max_bullet_fraction,
        max_dup_line_fraction=max_dup_line_fraction,
    )
    return docs.select(
        F.col(id_col),
        *[expr.alias(name) for name, expr in metrics.items()],
        *[expr.alias(name) for name, expr in rules.items()],
        gopher_passes_expr(rules).alias("passes"),
    )


def _gopher_exprs(
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_fraction: float = 0.8,
    min_stop_kinds: int = 2,
    max_ellipsis_fraction: float = 0.3,
    max_bullet_fraction: float = 0.9,
    max_dup_line_fraction: float = 0.3,
):
    """(metrics, rules) expression dicts shared by :func:`gopher_flags`
    (the report) and ``curate_corpus(gopher_rules=True)`` (the inline
    gate) — one definition of the rule set, two consumers."""
    from dataflow_python_etl_spark.functions.text import (
        alpha_word_fraction,
        bullet_line_fraction,
        dup_line_fraction,
        ellipsis_line_fraction,
        mean_token_len,
        stopword_kinds,
        symbol_word_ratio,
        token_count,
    )

    n_words = token_count(text_col).cast("long")
    mwl = mean_token_len(text_col)
    sym = symbol_word_ratio(text_col)
    alpha = alpha_word_fraction(text_col)
    kinds = stopword_kinds(text_col)
    ell = ellipsis_line_fraction(text_col)
    bullet = bullet_line_fraction(text_col)
    dup = dup_line_fraction(text_col)
    metrics = {
        "n_words": n_words,
        "mean_word_len": F.round(mwl, 6),
        "symbol_ratio": sym,
        "alpha_fraction": alpha,
        "n_stop_kinds": kinds,
    }
    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len),
        "rule_symbol_ratio": sym <= max_symbol_ratio,
        "rule_alpha_words": alpha >= min_alpha_fraction,
        "rule_stop_words": kinds >= min_stop_kinds,
        "rule_ellipsis_lines": ell <= max_ellipsis_fraction,
        "rule_bullet_lines": bullet <= max_bullet_fraction,
        "rule_dup_lines": dup <= max_dup_line_fraction,
    }
    return metrics, rules


def gopher_passes_expr(rules: dict | None = None):
    """The conjunction of the Gopher rules as one boolean Column (all
    defaults when ``rules`` is None) — a zero-shuffle filter expression
    for use inside a larger plan."""
    if rules is None:
        _, rules = _gopher_exprs("text")
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    return passes


def curate_corpus(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str | None = None,
    max_per_domain: int = 1000,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    cosine_threshold: float = 0.9,
    max_shingle_df: int | None = 64,
    quota_salt_buckets: int | None = None,
    lm_bottom_fraction: float | None = None,
    lang_col: str | None = None,
    line_dedup: bool = False,
    normalized_dedup: bool = False,
    simhash_max_hamming: int | None = None,
    decontaminate_against: DataFrame | None = None,
    decontaminate_min_overlap: int = 1,
    span_dedup_n: int | None = None,
    boilerplate_min_docs: int | None = None,
    boilerplate_split: str = "\n",
    boilerplate_joiner: str = "\n",
    gopher_rules: bool = False,
    classifier_weights: DataFrame | None = None,
    classifier_min_margin: int = 0,
    classifier_buckets: int = 1024,
    images: DataFrame | None = None,
    image_payload_col: str = "payload",
    image_max_hamming: int = 6,
    audio: DataFrame | None = None,
    audio_payload_col: str = "payload",
    audio_max_hamming: int = 6,
    videos: DataFrame | None = None,
    video_payload_col: str = "payload",
    video_min_jaccard_ppm: int = 500_000,
    url_col: str | None = None,
    html_extract: bool = False,
    mojibake_repair: bool = False,
) -> DataFrame:
    """The full training-corpus curation pipeline, one lazy plan:

    -2. optional encoding repair (``mojibake_repair``): one level of
       UTF-8-read-as-CP1252 mojibake is inverted
       (``functions.text.repair_mojibake`` — q162's literal replace
       chain) before ANY tier reads the text, so gremlin sequences
       never reach tokenization, shingles, quality signals, or the
       HTML rules. Zero-shuffle projection;
    -1. optional HTML-to-text extraction (``html_extract``): raw
       crawl markup in ``text_col`` becomes main-content text
       (``functions.text.html_to_text`` — q157's regexp chain)
       before ANY other tier, so provenance dedup, scrub, quality,
       and every dedup tier operate on text, not tags. Docs whose
       markup carries no text are dropped by this tier (the
       empty-string quality-gate leak, as with spans);
    0. optional canonical-URL dedup (``url_col``): raw fetches whose
       URLs canonicalize identically (case/port/fragment/tracking-
       param/slash variants — ``functions.url.canonical_url``)
       collapse to the min-id survivor BEFORE any content work — the
       cheapest possible tier (ONE scan: one projection + one hash
       shuffle on the canonical string), so every content-hashing
       tier below sees each page once. NULL and blank URLs pass
       through untouched (absent provenance is not a page identity —
       each such doc keys on a private sentinel);
    1. PII scrub (typed placeholders — before anything downstream can
       memorize raw identifiers);
    1b. optional in-document line dedup (``line_dedup``): repeated
       non-empty lines collapse to their first occurrence
       (``functions.text.dedup_lines`` — nav menus, cookie banners)
       INSIDE the same zero-shuffle projection as the scrub, so the
       quality score and every later tier see the cleaned text;
    1b'. optional corpus-level boilerplate segment removal
       (``boilerplate_min_docs``): exact non-blank segments (lines by
       default; ``boilerplate_split``/``boilerplate_joiner`` choose
       the segmentation) appearing in at least that many DISTINCT
       documents are cut from every document
       (``dedup.dedup_boilerplate_segments`` — the CCNet/RefinedWeb
       line-dedup tier). First cross-doc shuffle when enabled; a doc
       emptied here is dropped by this tier (same empty-string
       rationale as the span tier);
    1c. optional cross-document span dedup (``span_dedup_n``): every
       run of ≥ that many tokens appearing in ≥2 documents is cut
       from ALL documents (``dedup.dedup_spans`` — the Lee et al.
       sequence-level tier). Runs BEFORE the quality gate so the
       quality score, the LM gate, and every doc-level dedup tier see
       the span-cleaned text. A document whose every token sat in
       duplicated spans comes out empty and is dropped BY THIS TIER
       (the length-based quality terms score an empty string 0.304,
       above the default gate — relying on the gate would leak empty
       rows). Note this tier normalizes whitespace (tokens rejoined
       with single spaces) and its cross-doc aggregation makes it the
       pipeline's first shuffle; also, removing shared spans can make
       two near-dup documents DISSIMILAR, so the later doc-level
       Jaccard tier may remove fewer whole documents — boilerplate is
       cut from every copy instead of one copy surviving intact;
    2. quality gate (composite heuristic ≥ ``min_quality``; with
       ``gopher_rules=True`` the hard Gopher rule set
       (:func:`gopher_flags`, default thresholds) is ANDed into the
       same zero-shuffle gate projection — soft score for ranking,
       hard rules for the published floor);
    2'. optional TRAINED quality gate (``classifier_weights``: a
       frozen ``classifier.quality_classifier_fit`` weight table):
       each quality survivor is scored by the hashed-linear
       classifier (one broadcast join + one per-doc agg — q161's
       operator) and kept iff ``margin > classifier_min_margin``;
       docs with no grams have no score row and are dropped by this
       tier (no evidence, no ingest). The heuristic gate above is the
       published floor, this tier is the LEARNED one (CCNet/
       RedPajama/Dolma's fastText stage); train on a bounded labeled
       split, gate the full pool — the DSIR weight-table posture;
    2a. optional benchmark decontamination (``decontaminate_against``):
       documents sharing ≥ ``decontaminate_min_overlap`` 3-gram
       shingles with the supplied eval/benchmark set are dropped
       (``dedup.contamination_check`` — corpus-side broadcast join,
       nothing corpus-sized shuffles). Runs before every dedup tier so
       a contaminated document can never survive as the min-id
       representative of its duplicate cluster;
    2b. optional normalized (fuzzy-exact) dedup
       (``normalized_dedup``): case/punctuation/whitespace variants
       collapse to the min-id survivor (``dedup_normalized``) at
       exact-dedup cost — the cheapest corpus-level tier, so it runs
       before the LM gate and the pair phases shrink further;
    2c. optional LM perplexity gate (``lm_bottom_fraction``): fit the
       char-trigram model on the survivors so far (per ``lang_col``
       stratum, or one global model) and drop each stratum's bottom
       fraction by mean log-prob — the CCNet recipe. Runs BEFORE the
       pair phase so the expensive dedup sees fewer docs. Documents
       too short to score (< 3 chars) are dropped by this gate.
    3. syntactic near-dup removal (capped n-gram Jaccard — copy-edits);
    3b. optional SimHash tier (``simhash_max_hamming``): Hamming-
       banded near-dup pairs (EXACT by pigeonhole for distance <
       8 bands) remove the higher id of each pair — catches small-edit
       near-dups whose Jaccard sits under ``jaccard_threshold``;
    3c. optional image near-dup tier (``images``: a ``(id_col,
       image_payload_col)`` frame carrying each document's image
       bytes): payloads of SURVIVING docs are really decoded
       (``operators.codecs``), fingerprinted with the portable
       integer aHash, and Hamming-banded
       (``multimodal.image_near_dup_pairs``) — the higher-id doc of
       each pair within ``image_max_hamming`` is dropped. Pruned to
       survivors first, so decode cost never exceeds the surviving
       corpus — the re-encoded/brightness-shifted duplicate image
       tier a multimodal crawl needs;
    3d. optional audio near-dup tier (``audio``: a ``(id_col,
       audio_payload_col)`` frame carrying each document's clip
       bytes): surviving docs' clips are really decoded (WAV/FLAC,
       ``operators.codecs``), fingerprinted with the portable integer
       successive-window energy hash, and Hamming-banded
       (``multimodal.audio_near_dup_pairs``) — the higher-id doc of
       each pair within ``audio_max_hamming`` is dropped (gain-scaled
       re-encodes land at hamming 0 by construction);
    3e. optional video near-dup tier (``videos``): surviving docs'
       clips are frame-decoded and per-frame aHashed, pairs form only
       where two videos SHARE a frame hash, and the higher-id doc of
       each pair with frame-hash-set Jaccard ≥
       ``video_min_jaccard_ppm`` (exact integer ppm) is dropped
       (``multimodal.video_near_dup_pairs`` — re-ordered/re-muxed
       copies score 1.0; a clip trimmed from a longer reel is the
       containment case, see ``dedup.containment_pairs``).
       Together with 3c this completes the multimodal near-dup
       matrix (text + image + audio + video) inside one pipeline;
    4. semantic near-dup removal (embedding cosine over LSH buckets —
       paraphrases; skipped when ``embeddings`` is None);
    5. per-domain quota (``cap_per_key``; skipped when ``domain_col``
       is None; set ``quota_salt_buckets`` when one domain dominates
       the crawl — see the two-phase variant's docstring).

    Order matters at scale: each stage shrinks the corpus the next
    (more expensive) stage sees — the regex gate is a map, normalized
    dedup is one hash shuffle, Jaccard touches only shingle-sharing
    survivors, the vector pass only quality survivors. Returns (id,
    scrubbed text, quality, n_tokens) survivors. Every tier reuses
    the standalone operator it names, so composing those operators in
    this documented order reproduces this function's output exactly
    (pinned in tests).
    """
    from dataflow_python_etl_spark.functions.text import (
        dedup_lines,
        html_to_text,
        pii_scrub,
        repair_mojibake,
    )

    if mojibake_repair:
        # tier -2: undo one level of UTF-8-read-as-CP1252 damage
        # BEFORE anything reads the text — gremlin sequences would
        # otherwise poison tokenization, shingles, quality signals,
        # and even the HTML rules below (a '<' inside a gremlin-split
        # entity). Pure literal-replace projection, zero shuffle,
        # collapses into the extraction/scrub projection.
        docs = docs.withColumn(text_col, repair_mojibake(F.col(text_col)))

    if html_extract:
        # tier -1: raw-HTML crawl items become text BEFORE any
        # provenance/content tier (same zero-shuffle projection class
        # as the scrub — Catalyst collapses them). A page whose markup
        # carries no text comes out EMPTY and is dropped HERE:
        # quality_score('') is 0.304, above the default gate, so
        # relying on the quality tier would leak empty rows (the span
        # tier's documented rationale).
        docs = docs.withColumn(text_col, html_to_text(F.col(text_col))).where(
            F.length(text_col) > 0
        )

    if url_col is not None:
        # tier 0: collapse re-fetches by canonical URL (min-id
        # survivor) in ONE scan + ONE hash shuffle: null/blank URLs
        # (absent provenance — not a page identity) get a per-row
        # sentinel key so they pass through untouched; \x00 cannot
        # appear in a real canonical. A union-of-two-filters shape
        # here would scan the raw corpus twice and re-evaluate the
        # regex chain per branch (review-caught).
        from pyspark.sql import Window

        from dataflow_python_etl_spark.functions.url import canonical_url

        key = F.coalesce(
            canonical_url(url_col),
            F.concat(F.lit("\x00noid:"), F.col(id_col).cast("string")),
        )
        w_url = Window.partitionBy("__curl")
        docs = (
            docs.withColumn("__curl", key)
            .withColumn("__keep", F.min(id_col).over(w_url))
            .where(F.col(id_col) == F.col("__keep"))
            .drop("__curl", "__keep")
        )

    txt = pii_scrub(text_col)
    if line_dedup:
        txt = dedup_lines(txt)
    keep_cols = [F.col(id_col), txt.alias(text_col)]
    if domain_col is not None:
        keep_cols.append(F.col(domain_col))
    if lang_col is not None and lang_col != domain_col:
        keep_cols.append(F.col(lang_col))
    scrubbed = docs.select(*keep_cols)
    if boilerplate_min_docs is not None:
        # 1b': corpus-level boilerplate segment removal (CCNet /
        # RefinedWeb line-dedup tier): exact segments appearing in
        # >= boilerplate_min_docs documents are cut from ALL
        # documents. Runs before the span tier (segment identity is
        # one aggregation over segment hashes — cheaper than the
        # token n-gram explode — so spans see boilerplate-free text)
        # and before the quality gate for the same reason as spans:
        # a doc emptied here must be dropped HERE (quality_score('')
        # is above the default gate).
        from dataflow_python_etl_spark.operators.dedup import (
            dedup_boilerplate_segments,
        )

        bp = (
            dedup_boilerplate_segments(
                scrubbed,
                id_col=id_col,
                text_col=text_col,
                min_docs=boilerplate_min_docs,
                split_pattern=boilerplate_split,
                joiner=boilerplate_joiner,
            )
            .where(F.trim(F.col("cleaned")) != "")
            .select(id_col, F.col("cleaned"))
        )
        passthrough = [c for c in scrubbed.columns if c != text_col]
        scrubbed = (
            scrubbed.select(*passthrough)
            .join(bp, id_col)
            .withColumnRenamed("cleaned", text_col)
        )
    if span_dedup_n is not None:
        from dataflow_python_etl_spark.operators.dedup import dedup_spans

        sp = (
            dedup_spans(scrubbed, id_col=id_col, text_col=text_col, n=span_dedup_n)
            .where(F.trim(F.col("cleaned")) != "")
            .select(id_col, F.col("cleaned"))
        )
        passthrough = [c for c in scrubbed.columns if c != text_col]
        scrubbed = (
            scrubbed.select(*passthrough)
            .join(sp, id_col)
            .withColumnRenamed("cleaned", text_col)
        )

    # Same barrier as clean_corpus: the gated projection (5-regex
    # scrub + regex-heavy quality score) feeds the pair pipeline AND
    # the survivor projection; without the registered persist both
    # branches re-evaluate the full scrub+score over the corpus.
    gate = F.col("quality") >= min_quality
    if gopher_rules:
        _, rules = _gopher_exprs(text_col)
        gate = gate & gopher_passes_expr(rules)
    gated = register_cache(
        scrubbed.withColumn("quality", quality_score(text_col)).where(gate)
    )
    if classifier_weights is not None:
        # tier 2': TRAINED quality gate (classifier.py — the
        # fastText-style hashed-linear model the heuristic gates
        # don't cover): FROZEN weights, one broadcast join + one agg
        # over the quality survivors; keep iff margin >
        # classifier_min_margin (margin > 0 is the model's own keep
        # class). Semi-join on scored ids means gramless docs are
        # dropped here — "no evidence, no ingest", the DSIR-gate
        # contract.
        from dataflow_python_etl_spark.operators.classifier import (
            quality_classifier_score_with,
        )

        keep_clf = (
            quality_classifier_score_with(
                gated,
                classifier_weights,
                id_col=id_col,
                text_col=text_col,
                buckets=classifier_buckets,
            )
            .where(F.col("margin") > classifier_min_margin)
            .select(F.col(id_col))
        )
        gated = register_cache(gated.join(keep_clf, id_col, "left_semi"))
    if decontaminate_against is not None:
        from dataflow_python_etl_spark.operators.dedup import contamination_check

        contaminated = contamination_check(
            gated,
            decontaminate_against,
            id_col=id_col,
            text_col=text_col,
            min_overlap=decontaminate_min_overlap,
        ).select(id_col)
        gated = register_cache(gated.join(contaminated, id_col, "left_anti"))
    if normalized_dedup:
        from dataflow_python_etl_spark.operators.dedup import (
            dedup_normalized as _dedup_normalized,
        )

        keep_norm = _dedup_normalized(gated, id_col=id_col, text_col=text_col).select(
            id_col
        )
        gated = register_cache(gated.join(keep_norm, id_col, "left_semi"))
    if lm_bottom_fraction is not None:
        if not 0.0 < lm_bottom_fraction < 1.0:
            raise ValueError(
                f"lm_bottom_fraction must be in (0, 1), got {lm_bottom_fraction}"
            )
        from pyspark.sql import Window

        from dataflow_python_etl_spark.operators.lm import (
            fit_char_ngram_lm,
            score_with_lm,
        )

        lang_expr = F.col(lang_col) if lang_col is not None else F.lit("all")
        lm_docs = gated.select(F.col(id_col), lang_expr.alias("lang"), F.col(text_col))
        model, floors = fit_char_ngram_lm(lm_docs, lang_col="lang", text_col=text_col)
        scores = score_with_lm(
            lm_docs, model, floors, id_col=id_col, lang_col="lang", text_col=text_col
        )
        # per-stratum cutoff at the requested fraction; keep >= cutoff
        # (the approx percentile is deterministic for a given dataset)
        cut = F.expr(f"percentile_approx(avg_logp, {lm_bottom_fraction})").over(
            Window.partitionBy("lang")
        )
        keep = (
            scores.withColumn("__cut", cut)
            .where(F.col("avg_logp") >= F.col("__cut"))
            .select(F.col(id_col))
        )
        gated = register_cache(gated.join(keep, id_col, "left_semi"))
    pairs = ngram_jaccard_pairs(
        gated, id_col=id_col, text_col=text_col,
        threshold=jaccard_threshold, max_shingle_df=max_shingle_df,
    )
    out = gated.join(
        pairs.select(F.col("doc_b").alias(id_col)).distinct(), id_col, "left_anti"
    )
    if simhash_max_hamming is not None:
        from dataflow_python_etl_spark.operators.dedup import (
            simhash_pairs as _simhash_pairs,
        )

        sh = _simhash_pairs(
            out, id_col=id_col, text_col=text_col, max_hamming=simhash_max_hamming
        )
        out = out.join(
            sh.select(F.col("doc_b").alias(id_col)).distinct(), id_col, "left_anti"
        )
    if images is not None:
        from dataflow_python_etl_spark.operators.multimodal import (
            image_near_dup_pairs,
        )

        # prune to current survivors FIRST: the decode is the dominant
        # cost of this tier and must only touch documents that passed
        # the cheaper text gates (same contract as the embedding prune).
        # Each multimodal tier consumes the survivor frame TWICE (the
        # prune semi-join and the removal anti-join) and later tiers
        # consume it again — without a registered persist the whole
        # upstream pair pipeline re-evaluates per consumer (measured
        # 2x+ on the composed q153).
        out = register_cache(out)
        img_pruned = images.join(
            out.select(id_col), id_col, "left_semi"
        )
        ip = image_near_dup_pairs(
            img_pruned,
            id_col=id_col,
            payload_col=image_payload_col,
            max_hamming=image_max_hamming,
        )
        out = out.join(
            ip.select(F.col("doc_b").alias(id_col)).distinct(), id_col, "left_anti"
        )
    if audio is not None:
        from dataflow_python_etl_spark.operators.multimodal import (
            audio_near_dup_pairs,
        )

        # same prune-first contract as the image tier: the decode is
        # the dominant cost and must only touch text-gate survivors
        out = register_cache(out)
        aud_pruned = audio.join(out.select(id_col), id_col, "left_semi")
        ap = audio_near_dup_pairs(
            aud_pruned,
            id_col=id_col,
            payload_col=audio_payload_col,
            max_hamming=audio_max_hamming,
        )
        out = out.join(
            ap.select(F.col("doc_b").alias(id_col)).distinct(), id_col, "left_anti"
        )
    if videos is not None:
        from dataflow_python_etl_spark.operators.multimodal import (
            video_near_dup_pairs,
        )

        out = register_cache(out)
        vid_pruned = videos.join(out.select(id_col), id_col, "left_semi")
        vp = video_near_dup_pairs(
            vid_pruned,
            id_col=id_col,
            payload_col=video_payload_col,
            min_jaccard_ppm=video_min_jaccard_ppm,
        )
        out = out.join(
            vp.select(F.col("vid_b").alias(id_col)).distinct(), id_col, "left_anti"
        )
    if embeddings is not None:
        # prune the vector table to current survivors FIRST — the
        # O(bucket²) scoring pass must only see documents that passed
        # the cheaper gates (this is the "each stage shrinks what the
        # next sees" contract; scoring removed docs is pure waste)
        emb_pruned = embeddings.join(
            out.select(F.col(id_col).alias("vec_id")), "vec_id", "left_semi"
        )
        out = semantic_dedup(out, emb_pruned, id_col=id_col, threshold=cosine_threshold)
    if domain_col is not None:
        out = cap_per_key(
            out, [domain_col], max_per_domain, [id_col], quota_salt_buckets
        )
    return out.select(
        F.col(id_col),
        F.col(text_col),
        F.col("quality"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )


def _real_token_count(text_col: str, token_mode: str) -> F.Column:
    """Per-doc token count in the requested unit: ``whitespace`` =
    split with '' artifacts dropped (the q64 lesson); ``bpe`` = the
    portable BPE-ish subword segmentation of q38 / chunk_documents
    (``functions.text.bpe_tokens`` — matches are non-empty by
    construction). Real training budgets are tokenizer-unit budgets
    (VERDICT r10 #3), so packing and mixing take the same
    ``token_mode`` switch chunking already has."""
    from dataflow_python_etl_spark.functions.text import bpe_token_count, tokens

    if token_mode == "bpe":
        return bpe_token_count(text_col).cast("long")
    if token_mode != "whitespace":
        raise ValueError(f"token_mode must be whitespace|bpe, got {token_mode!r}")
    return F.size(
        F.filter(tokens(text_col), lambda x: F.length(x) > 0)
    ).cast("long")


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int = 32,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Fixed-length training-sequence packing — the export step every
    LLM pipeline runs after curation: documents are concatenated in
    ``id_col`` order, one EOS token appended per document, and the
    token stream is cut into back-to-back sequences of ``seq_len``
    tokens (documents cross sequence boundaries — contiguous packing,
    the GPT-style recipe; the last sequence may be partial). Returns
    one row per sequence: ``(seq_id, n_docs, n_tokens, first_doc,
    last_doc)`` — the packing MANIFEST (which docs land in which
    sequence, how full it is); the token payload itself stays with
    the shard writer.

    Tokens are whitespace tokens with empty strings dropped (the ''
    split artifact — q64 lesson); a document with zero real tokens is
    dropped entirely (no EOS-only rows: no evidence, no sequence —
    the DSIR-gate contract).

    Scale shape: the global token prefix sum is computed WITHOUT the
    single-partition ``Window.orderBy`` wall (the :func:`~.events.
    global_rank` machinery): range-repartition on ``id_col``, ONE
    narrow hash exchange of the (id, n_tok) projection for the
    per-partition running sum, per-partition token totals broadcast
    back as offsets. Each document then explodes to only the
    ``<= n_tok/seq_len + 1`` sequences it overlaps, and the final
    agg shuffles on ``seq_id``. Everything downstream of the token
    COUNT is O(docs), never O(tokens) — the token stream itself is
    never materialized."""
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.dedup import register_cache

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    t = docs.select(
        F.col(id_col),
        (_real_token_count(text_col, token_mode) + F.lit(1))
        .cast("long")
        .alias("n_tok"),
    ).where(F.col("n_tok") >= 2)  # >=1 real token (+1 EOS)
    part = register_cache(
        t.repartitionByRange(partitions, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftright(F.col("_mid"), 33)
    psums = part.groupBy(pid.alias("_pid")).agg(F.sum("n_tok").alias("_cnt"))
    tiny = Window.orderBy("_pid")  # partitions-row frame, not data-sized
    offsets = psums.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(tiny.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
    )
    w = Window.partitionBy("_pid").orderBy("_mid")
    pref = (
        part.withColumn("_pid", pid)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            "start",
            (F.col("_off") + F.sum("n_tok").over(w) - F.col("n_tok")).cast("long"),
        )
    )
    spans = pref.select(
        F.col(id_col),
        "n_tok",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start div {seq_len}"),
                F.expr(f"(start + n_tok - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    return (
        spans.withColumn(
            "tok_in_seq",
            F.least(
                F.col("start") + F.col("n_tok"),
                (F.col("seq_id") + 1) * F.lit(seq_len),
            )
            - F.greatest(F.col("start"), F.col("seq_id") * F.lit(seq_len)),
        )
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tok_in_seq").cast("long").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def select_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    partitions: int = 32,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Static data-MIXING selection — the mixture-weights step of a
    training run (DoReMi / The Pile recipe: each domain contributes a
    token BUDGET, not a document count): within each domain, take
    documents in ``id_col`` order while the domain's running token
    total is under ``budget_tokens``; the document that CROSSES the
    budget is kept (greedy fill — progress is guaranteed even when
    one document exceeds the whole budget) and everything after it is
    cut. Returns the selected manifest ``(id, domain, n_tokens,
    cum_before)`` where ``cum_before`` is the domain's token total
    before this document — the oracle-checkable audit trail of WHY
    each doc made the mix.

    Token counting matches :func:`pack_sequences` (whitespace tokens,
    empties dropped, zero-token docs excluded).

    Scale shape: per-domain running sums over FEW domains are the
    same single-partition wall as a global order — a plain
    ``Window.partitionBy(domain)`` funnels each domain's terabytes
    through one task. This spells the grouped prefix sum with the
    distributed machinery instead: range-repartition on (domain, id),
    per-(domain, partition) token totals broadcast back as offsets,
    in-partition running sum keyed by (domain, _pid). One narrow hash
    exchange of the (id, domain, n_tok) projection; the text column
    never shuffles."""
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.dedup import register_cache

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    t = docs.select(
        F.col(id_col),
        F.col(domain_col).alias("__dom"),
        _real_token_count(text_col, token_mode).alias("n_tokens"),
    ).where(F.col("n_tokens") >= 1)
    part = register_cache(
        t.repartitionByRange(partitions, F.col("__dom"), F.col(id_col))
        .sortWithinPartitions("__dom", id_col)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftright(F.col("_mid"), 33)
    psums = part.groupBy("__dom", pid.alias("_pid")).agg(
        F.sum("n_tokens").alias("_cnt")
    )
    tiny = Window.partitionBy("__dom").orderBy("_pid")
    offsets = psums.select(
        "__dom",
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(tiny.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
    )
    w = Window.partitionBy("__dom", "_pid").orderBy("_mid")
    return (
        part.withColumn("_pid", pid)
        .join(F.broadcast(offsets), ["__dom", "_pid"])
        .withColumn(
            "cum_before",
            (F.col("_off") + F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .cast("long"),
        )
        .where(F.col("cum_before") < budget_tokens)
        .select(
            F.col(id_col),
            F.col("__dom").alias(domain_col),
            "n_tokens",
            "cum_before",
        )
    )
