"""Corpus pipeline composition + iterative dup clustering."""

from dataflow_python_etl_spark.operators.corpus import clean_corpus, dup_clusters
from dataflow_python_etl_spark.queries import QUERIES
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_clean_corpus_removes_near_dups_and_low_quality(spark):
    docs = read_table(spark, SF_DIR, "documents")
    out = clean_corpus(docs)
    n_docs = docs.count()
    survivors = out.count()
    assert 0 < survivors < n_docs
    pairs = QUERIES["q24_ngram_jaccard_pairs"].fn(spark, SF_DIR).collect()
    removed_bs = {p["doc_b"] for p in pairs}
    kept = {r["doc_id"] for r in out.collect()}
    assert kept.isdisjoint(removed_bs)


def test_dup_clusters_match_union_find(spark):
    pairs_df = QUERIES["q24_ngram_jaccard_pairs"].fn(spark, SF_DIR)
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert pairs
    got = {r["node"]: r["cluster"] for r in dup_clusters(pairs_df).collect()}

    # reference union-find on the same edges
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


def test_dup_clusters_random_graphs_match_union_find(spark):
    """Randomized topologies: chains (deep diameter), stars, cliques,
    and sparse random graphs all converge to the union-find answer —
    the pointer-jump path must not cut corners on any shape."""
    import random

    rng = random.Random(20260813)
    graphs = [
        [(i, i + 1) for i in range(0, 30)],                      # 31-chain (deep)
        [(0, i) for i in range(1, 20)],                          # star
        [(a, b) for a in range(5) for b in range(a + 1, 5)]      # clique
        + [(10, 11), (12, 13), (13, 14)],                        # + islands
        [(rng.randrange(40), rng.randrange(40)) for _ in range(35)],
    ]
    for edges in graphs:
        edges = [(a, b) for a, b in edges if a != b]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {n: find(n) for n in parent}

        pairs_df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
        got = {
            r["node"]: r["cluster"] for r in dup_clusters(pairs_df).collect()
        }
        assert got == want, f"mismatch on graph with {len(edges)} edges"


def test_stratified_sample_semantics(spark):
    """Content-addressed per-stratum sampling: rebalanced rates land
    near target, membership is rerun/partitioning-stable, unknown
    strata follow default_rate (0 = allowlist drop)."""
    from dataflow_python_etl_spark.operators.corpus import stratified_sample
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "lang")
    out = stratified_sample(docs, "lang", {"en": 0.2, "zh": 0.9}, "doc_id")
    rows = out.collect()
    per = {}
    for r in rows:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # default_rate=0: strata not in rates vanish entirely
    assert set(per) <= {"en", "zh"}
    assert abs(per["en"] / totals["en"] - 0.2) < 0.12
    assert abs(per["zh"] / totals["zh"] - 0.9) < 0.12
    # rerun + repartition → identical membership (content-addressed)
    again = {r["doc_id"] for r in stratified_sample(
        docs.repartition(17), "lang", {"en": 0.2, "zh": 0.9}, "doc_id"
    ).collect()}
    assert again == {r["doc_id"] for r in rows}
    # zero-shuffle map plan
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str
    assert count_exchanges(out) == 0
    assert "EvalPython" not in explain_str(out)


def test_stratified_sample_validation(spark):
    import pytest

    from dataflow_python_etl_spark.operators.corpus import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id: long, lang: string")
    with pytest.raises(ValueError, match="rate for"):
        stratified_sample(df, "lang", {"en": 1.5}, "doc_id")
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample(df, "lang", {"en": 0.5}, "doc_id", default_rate=-0.1)


def test_kfold_by_group_closure_and_stability(spark):
    import pytest
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.corpus import kfold_by_group
    from dataflow_python_etl_spark.plans.checks import count_exchanges

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "source")
    out = kfold_by_group(docs, "source", 5)
    assert count_exchanges(out) == 0  # pure map-side projection
    rows = out.collect()
    assert all(0 <= r["fold"] < 5 for r in rows)
    per_src = {}
    for r in rows:  # group closure: one fold per source
        per_src.setdefault(r["source"], set()).add(r["fold"])
    assert all(len(fs) == 1 for fs in per_src.values())
    assert len({f for fs in per_src.values() for f in fs}) == 5
    # growth stability: a subset of groups keeps its folds
    sub = kfold_by_group(
        docs.where(F.col("source") == rows[0]["source"]), "source", 5
    ).first()
    assert {sub["fold"]} == per_src[rows[0]["source"]]
    with pytest.raises(ValueError, match="k must be"):
        kfold_by_group(docs, "source", 1)


def test_components_contract_matches_flood_and_guards(spark):
    """Min-contraction CC (the scale-path primitive core_communities
    uses) must agree with dup_clusters' flood everywhere — including
    the 60-node path that takes the flood ~30 rounds (the measured
    q160 regression class) and an adversarial id permutation — and
    fail LOUDLY at the round cap instead of returning a partial
    contraction."""
    import random

    import pytest

    from dataflow_python_etl_spark.operators.corpus import (
        components_contract,
        dup_clusters,
    )

    def check(pairs):
        df = spark.createDataFrame(pairs, "src: long, dst: long")
        got = {
            r["node"]: r["cluster"] for r in components_contract(df).collect()
        }
        want = {
            r["node"]: r["cluster"]
            for r in dup_clusters(
                df.toDF("doc_a", "doc_b"), max_iterations=200
            ).collect()
        }
        assert got == want and got
        return got

    path = [(i, i + 1) for i in range(1, 60)]
    assert len(set(check(path).values())) == 1
    random.seed(2)
    perm = list(range(1, 61))
    random.shuffle(perm)
    check([(perm[i], perm[i + 1]) for i in range(59)])
    # blobs + bridge + separate triangle; reversed-duplicate noise
    # (dup_clusters is kept self-loop-free by its pair producers, so
    # the parity set excludes them; the contraction's own self-loop
    # drop is asserted separately)
    blobs = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10),
             (20, 21), (21, 22), (22, 20), (2, 1)]
    got = check(blobs)
    assert len(set(got.values())) == 2
    with_loop = spark.createDataFrame(
        blobs + [(5, 5)], "src: long, dst: long"
    )
    assert 5 not in {
        r["node"] for r in components_contract(with_loop).collect()
    }

    df = spark.createDataFrame(path, "src: long, dst: long")
    with pytest.raises(RuntimeError, match="contracted edges remain"):
        components_contract(df, max_rounds=1).collect()
    with pytest.raises(ValueError, match="probe_every"):
        dup_clusters(df.toDF("doc_a", "doc_b"), probe_every=0)
