"""Fitted-centroid IVF ANN tier and embedding-cosine semantic dedup."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.corpus import semantic_dedup
from dataflow_python_etl_spark.operators.similarity import (
    cosine_pairs_lsh,
    cosine_topk,
    fit_ivf_centroids,
    ivf_topk,
)
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return fit_ivf_centroids(emb, k=4, max_iter=10)


def test_fitted_centroids_shape_and_norm(centroids, emb):
    dim = len(emb.first()["embedding"])
    assert len(centroids) == 4
    assert all(len(c) == dim for c in centroids)
    for c in centroids:
        nrm = sum(x * x for x in c) ** 0.5
        assert abs(nrm - 1.0) < 1e-3  # unit-norm (spherical k-means)


def test_ivf_full_probe_equals_exact(spark, emb, centroids):
    """n_probe == K degenerates to brute force: must equal cosine_topk
    exactly (same rounding, same tie-break)."""
    queries = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=3).collect()
    full = ivf_topk(emb, queries, centroids, k=3, n_probe=len(centroids)).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])
    assert sorted(map(key, full)) == sorted(map(key, exact))


def test_ivf_probe_recall_floor(spark, emb, centroids):
    """Single-cell probing touches ~1/K of the corpus; multi-probe must
    recover most exact neighbors, and recall must not DECREASE with
    n_probe."""
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=3).collect()
    }
    recalls = []
    for n_probe in (1, 2):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, queries, centroids, k=3, n_probe=n_probe).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls[0] >= 0.4, recalls
    assert recalls[1] >= max(recalls[0], 0.6), recalls


def test_semantic_dedup_removes_pair_tails(spark, emb):
    docs = read_table(spark, SF_DIR, "documents")
    # embeddings vec_id aligns with documents doc_id on the testdata
    pairs = cosine_pairs_lsh(emb, threshold=0.9).collect()
    removed = {p["id_b"] for p in pairs}
    out = semantic_dedup(docs, emb, threshold=0.9)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - removed
    # survivors of each pair (the lower id) stay
    assert all(min(p["id_a"], p["id_b"]) in kept or p["id_a"] in removed for p in pairs)


def test_cosine_pairs_lsh_string_ids(spark, emb):
    """The LSH pair kernel preserves the caller's id type."""
    sem = emb.selectExpr("concat('doc-', vec_id) AS vec_id", "embedding")
    base = {
        (f"doc-{r['id_a']}", f"doc-{r['id_b']}", r["cos_sim"])
        for r in cosine_pairs_lsh(emb, threshold=0.9).collect()
    }
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cosine_pairs_lsh(sem, threshold=0.9).collect()
    }
    # NOTE: string ordering differs from numeric (doc-10 < doc-2), so
    # compare as unordered pairs
    norm = lambda s: {(frozenset((a, b)), c) for a, b, c in s}
    assert norm(got) == norm(base)
    assert all(isinstance(r, str) for pair in got for r in list(pair)[:2])


def test_ivf_indexed_matches_inline_and_prunes(spark, emb, centroids, tmp_path):
    """The persisted IVF index returns exactly ivf_topk's results at
    every n_probe, and its corpus scan is partition-pruned to the
    probed cells (cid is a partition column, filtered pre-scan)."""
    import os

    from dataflow_python_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    path = str(tmp_path / "ivf_index")
    build_ivf_index(emb, centroids, path)
    # one partition dir per non-empty cell
    cells = [d for d in os.listdir(path) if d.startswith("cid=")]
    assert 1 < len(cells) <= len(centroids)

    queries = emb.where(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])
    for n_probe in (1, 2, len(centroids)):
        inline = ivf_topk(emb, queries, centroids, k=3, n_probe=n_probe).collect()
        indexed = ivf_topk_indexed(
            spark, path, queries, centroids, k=3, n_probe=n_probe
        ).collect()
        assert sorted(map(key, indexed)) == sorted(map(key, inline)), n_probe

    # pruning pin: with n_probe=1 the scan's partition filter keeps
    # only the probed cells, not the whole index
    df = ivf_topk_indexed(spark, path, queries, centroids, k=3, n_probe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan


def test_ivf_append_equals_full_rebuild(spark, emb, centroids, tmp_path):
    """Incremental index maintenance: build on part A, append part B →
    identical query results to a full rebuild over A ∪ B, at EVERY
    n_probe (frozen centroids make the two indexes row-identical)."""
    from dataflow_python_etl_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    part_a = emb.where(F.col("vec_id") % 3 != 0)
    part_b = emb.where(F.col("vec_id") % 3 == 0)
    inc = str(tmp_path / "ivf_inc")
    full = str(tmp_path / "ivf_full")
    build_ivf_index(part_a, centroids, inc)
    append_to_ivf_index(part_b, centroids, inc)
    build_ivf_index(emb, centroids, full)

    queries = emb.where(F.col("vec_id") < 8)
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])  # noqa: E731
    for n_probe in range(1, len(centroids) + 1):
        got = sorted(
            map(key, ivf_topk_indexed(spark, inc, queries, centroids, k=3, n_probe=n_probe).collect())
        )
        want = sorted(
            map(key, ivf_topk_indexed(spark, full, queries, centroids, k=3, n_probe=n_probe).collect())
        )
        assert got == want and got, n_probe


def test_ivf_index_staleness(spark, emb, centroids, tmp_path):
    """Balanced index → not stale; a drifted append flooding one cell
    → stale flips, telling the caller to re-fit instead of appending
    further."""
    from dataflow_python_etl_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_index_stats,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, centroids, path)
    before = ivf_index_stats(spark, path, n_cells=len(centroids))
    assert before["total"] == emb.count()
    assert not before["stale"], before

    # drift: a large batch of near-identical vectors lands in ONE cell
    dim = len(emb.first()["embedding"])
    hot = spark.range(10_000, 10_000 + 9 * before["total"]).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0 if i == 0 else 0.01) for i in range(dim)]).alias("embedding"),
    )
    append_to_ivf_index(hot, centroids, path)
    after = ivf_index_stats(spark, path, n_cells=len(centroids))
    assert after["total"] == before["total"] * 10
    assert after["max_cell"] >= 9 * before["total"]
    assert after["stale"], after


def test_ivf_sq8_index_recall_and_size(spark, emb, centroids, tmp_path):
    """SQ8 inverted file: ~4x smaller on disk, asymmetric scoring
    within quantization error of full precision, recall vs the fp64
    index pinned at n_probe=K (where both are exhaustive)."""
    import os

    from dataflow_python_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    fp, q8 = str(tmp_path / "fp"), str(tmp_path / "q8")
    build_ivf_index(emb, centroids, fp)
    build_ivf_index(emb, centroids, q8, quantize="int8")

    def nbytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    assert nbytes(q8) < 0.5 * nbytes(fp), (nbytes(q8), nbytes(fp))

    queries = emb.where(F.col("vec_id") < 10)
    K = len(centroids)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ivf_topk_indexed(spark, fp, queries, centroids, k=3, n_probe=K).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ivf_topk_indexed(spark, q8, queries, centroids, k=3, n_probe=K).collect()
    }
    recall = len(set(exact) & set(quant)) / len(exact)
    assert recall >= 0.9, recall
    for k in set(exact) & set(quant):
        assert abs(exact[k] - quant[k]) < 0.01, (k, exact[k], quant[k])


def test_ivf_sq8_append_matches_rebuild(spark, emb, centroids, tmp_path):
    """Incremental append keeps SQ8 parity: append(int8) ≡ full
    rebuild(int8) for the combined corpus; a mismatched-precision
    append fails on schema merge instead of silently mixing."""
    import pytest

    from dataflow_python_etl_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    part_a = emb.where(F.col("vec_id") % 3 != 0)
    part_b = emb.where(F.col("vec_id") % 3 == 0)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_ivf_index(part_a, centroids, inc, quantize="int8")
    append_to_ivf_index(part_b, centroids, inc, quantize="int8")
    build_ivf_index(emb, centroids, full, quantize="int8")
    queries = emb.where(F.col("vec_id") < 8)
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])  # noqa: E731
    for n_probe in (1, len(centroids)):
        got = sorted(map(key, ivf_topk_indexed(spark, inc, queries, centroids, k=3, n_probe=n_probe).collect()))
        want = sorted(map(key, ivf_topk_indexed(spark, full, queries, centroids, k=3, n_probe=n_probe).collect()))
        assert got == want and got, n_probe
    with pytest.raises(Exception):  # fp64 rows into an int8 index
        append_to_ivf_index(part_b, centroids, inc)
        spark.read.parquet(inc).select("qvec", "cvec").collect()


def test_ivf_rebuild_is_swap_safe(spark, emb, centroids, tmp_path):
    """Rebuilding over an existing index goes through the canonical
    temp-and-swap: identical results, no .__tmp_/.__bak_ leftovers
    (vacuum-clean), partition pruning still applies."""
    import glob

    from dataflow_python_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, centroids, path)
    queries = emb.where(F.col("vec_id") < 5)
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk_indexed(spark, path, queries, centroids, k=3, n_probe=2).collect()
    )
    build_ivf_index(emb, centroids, path)  # rebuild over existing
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk_indexed(spark, path, queries, centroids, k=3, n_probe=2).collect()
    )
    assert got == want
    assert not glob.glob(f"{path}.__*")  # swap left nothing behind


def test_ivf_append_validation_is_loud(spark, emb, centroids, tmp_path):
    """The append path's failure modes all raise ValueError with an
    actionable message BEFORE touching the index: quantize mismatch
    (no silent mixed-schema footers), missing index, and a leftover
    stage dir from a crashed append."""
    import os

    from dataflow_python_etl_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
    )

    path = str(tmp_path / "ivf")
    with pytest.raises(ValueError, match="build_ivf_index first"):
        append_to_ivf_index(emb, centroids, path)

    build_ivf_index(emb, centroids, path)  # fp64 index
    with pytest.raises(ValueError, match="quantize mismatch"):
        append_to_ivf_index(emb, centroids, path, quantize="int8")
    with pytest.raises(ValueError, match="quantize mismatch"):
        append_to_ivf_index(emb, centroids, path, quantize="pq")

    # crashed-append simulation: a leftover hidden stage dir refuses
    # further appends (re-running would duplicate the moved ids) and
    # stays INVISIBLE to readers (hidden-dir convention)
    n_before = spark.read.parquet(path).count()
    os.makedirs(os.path.join(path, ".__append_tmp_deadbeef"))
    assert spark.read.parquet(path).count() == n_before
    with pytest.raises(ValueError, match="leftover append stage"):
        append_to_ivf_index(emb.limit(5), centroids, path)
    os.rmdir(os.path.join(path, ".__append_tmp_deadbeef"))

    # a successful append leaves no stage dir behind
    delta = emb.where(F.col("vec_id") >= 490).withColumn(
        "vec_id", F.col("vec_id") + 10_000
    )
    append_to_ivf_index(delta, centroids, path)
    assert not [d for d in os.listdir(path) if d.startswith(".__append_tmp_")]
    assert spark.read.parquet(path).count() == n_before + delta.count()


def test_knn_classify_majority_and_ties(spark):
    """Crafted 2-D vectors: query at (1,0); corpus has 3 label-1
    vectors near (1,0), 2 label-0 vectors near (0,1) — k=5 votes
    3:2 for label 1. A second query at (0,1) flips it. Vote ties
    (k=2 case) go to the smallest label."""
    import pytest

    from dataflow_python_etl_spark.operators.similarity import knn_classify

    rows = [
        (1, [1.0, 0.0], 1), (2, [0.9, 0.1], 1), (3, [0.8, 0.2], 1),
        (4, [0.1, 0.9], 0), (5, [0.0, 1.0], 0),
    ]
    corpus = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>, label: int")
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05], 9), (101, [0.05, 1.0], 9)],
        "vec_id: long, embedding: array<double>, label: int",
    )
    got = {r["query_id"]: r for r in knn_classify(corpus, queries, k=5).collect()}
    assert got[100]["predicted_label"] == 1 and got[100]["votes"] == 3
    # k=5 sees the WHOLE 5-vector corpus, so majority is label 1 even
    # for the (0,1)-side query — the k-locality only kicks in below
    assert got[101]["predicted_label"] == 1 and got[101]["votes"] == 3
    # with k=2 only the two nearest vote: query 100 -> two label-1s,
    # query 101 -> two label-0s
    got2 = {r["query_id"]: r for r in knn_classify(corpus, queries, k=2).collect()}
    assert got2[100]["predicted_label"] == 1 and got2[100]["votes"] == 2
    assert got2[101]["predicted_label"] == 0 and got2[101]["votes"] == 2
    with pytest.raises(ValueError, match="k must be"):
        knn_classify(corpus, queries, k=0)


def test_ivf_index_self_describing_and_rebalance(spark, emb, centroids, tmp_path):
    """The index carries its own centroids (sidecar rides the swap):
    centroids=None probes load them, rebalance_ivf_index refits +
    rebuilds atomically preserving the quantize mode and PQ
    codebooks, and a healthy index is left alone."""
    import os

    from dataflow_python_etl_spark.operators.similarity import (
        CENTROID_SIDECAR,
        build_ivf_index,
        fit_pq_grid_codebooks,
        ivf_topk_indexed,
        load_ivf_centroids,
        load_pq_codebooks,
        rebalance_ivf_index,
    )

    path = str(tmp_path / "ivf_self")
    build_ivf_index(emb, centroids, path)
    assert load_ivf_centroids(path) == centroids
    queries = emb.where(F.col("vec_id") < 5)

    def topk(cents):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cos_sim"])
            for r in ivf_topk_indexed(
                spark, path, queries, cents, k=3, n_probe=len(centroids)
            ).collect()
        )

    assert topk(None) == topk(centroids)

    # healthy balance: no-op
    assert rebalance_ivf_index(emb, path) is None
    assert load_ivf_centroids(path) == centroids

    # forced rebuild: new centroids land atomically, probes keep working
    new_c = rebalance_ivf_index(emb, path, force=True)
    assert new_c is not None and load_ivf_centroids(path) == new_c
    got = ivf_topk_indexed(spark, path, queries, None, k=3,
                           n_probe=len(new_c)).collect()
    assert len(got) == 5 * 3
    # full probe degenerates to brute force, so results match the old
    # full-probe answer regardless of the new cell boundaries
    assert sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in got
    ) == topk(centroids)

    # PQ mode: rebuild preserves mode and codebooks
    books = fit_pq_grid_codebooks()
    pq_path = str(tmp_path / "ivf_self_pq")
    build_ivf_index(emb, centroids, pq_path, quantize="pq", pq_codebooks=books)
    new_c2 = rebalance_ivf_index(emb, pq_path, force=True)
    assert new_c2 is not None
    assert load_pq_codebooks(pq_path) == books
    idx_cols = spark.read.parquet(pq_path).schema.fieldNames()
    assert "pq_codes" in idx_cols

    # lost sidecar: loud, with the rebuild hint
    os.remove(os.path.join(path, CENTROID_SIDECAR))
    with pytest.raises(ValueError, match="no _centroids.json"):
        load_ivf_centroids(path)


def test_hard_negatives_label_predicate_and_nulls(spark):
    """Crafted 2-D vectors: the nearest SAME-label vector must never
    appear (predicate inside the join), the nearest different-label
    vectors rank by cosine with id tie-break, and NULL-labeled rows
    produce no pairs on either side."""
    from dataflow_python_etl_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 0),     # anchor
        (2, [0.99, 0.1], 0),    # same label, nearest overall — excluded
        (3, [0.9, 0.3], 1),     # hard negative #1
        (4, [0.7, 0.7], 1),     # hard negative #2
        (5, [0.0, 1.0], 1),     # easy negative
        (6, [0.95, 0.2], None), # NULL label: never pairs
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>, label: int"
    )
    got = hard_negatives(df, df.where("vec_id = 1"), k=2).collect()
    assert [(r["neighbor_id"], r["neighbor_label"]) for r in got] == [(3, 1), (4, 1)]
    assert all(r["anchor_label"] == 0 and r["query_id"] == 1 for r in got)
    # NULL-labeled anchor: no output rows at all
    assert hard_negatives(df, df.where("vec_id = 6"), k=2).count() == 0
