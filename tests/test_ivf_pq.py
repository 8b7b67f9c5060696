"""PQ codebook fitting, grid-PQ encoding, and PQ append parity.

Split out of test_ivf_semantic.py: that one file measured 842 s —
the certify shard-packing floor (a shard cannot be shorter than its
longest file). Three ~280 s files let the duration-ledger packer
balance them across shards. Module fixtures are re-declared (cheap:
centroid/codebook fits are seconds) so each file is self-contained.
"""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.similarity import fit_ivf_centroids
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return fit_ivf_centroids(emb, k=4, max_iter=10)


@pytest.fixture(scope="module")
def pq_books(emb):
    from dataflow_python_etl_spark.operators.similarity import fit_pq_codebooks

    return fit_pq_codebooks(emb, m=32, ksub=64)


def test_fit_pq_codebooks_shape_determinism_validation(emb, pq_books):
    from dataflow_python_etl_spark.operators.similarity import fit_pq_codebooks

    assert len(pq_books) == 32
    assert all(len(cb) == 64 for cb in pq_books)
    assert all(len(c) == 2 for cb in pq_books for c in cb)
    # deterministic: same seed, same sample -> identical codebooks
    again = fit_pq_codebooks(emb, m=32, ksub=64)
    assert again == pq_books
    with pytest.raises(ValueError, match="ksub"):
        fit_pq_codebooks(emb, m=8, ksub=256)  # codes must fit tinyint
    with pytest.raises(ValueError, match="divisible"):
        fit_pq_codebooks(emb, m=7)
    with pytest.raises(ValueError, match="sample"):
        fit_pq_codebooks(emb.limit(3), m=8, ksub=16)


def test_ivf_pq_append_matches_rebuild(spark, emb, centroids, pq_books, tmp_path):
    """append(pq) re-encodes the delta with the index's OWN sidecar
    codebooks (drift impossible by construction) and equals a full
    rebuild at every n_probe."""
    from dataflow_python_etl_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
    )

    part_a = emb.where(F.col("vec_id") % 3 != 0)
    part_b = emb.where(F.col("vec_id") % 3 == 0)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_ivf_index(part_a, centroids, inc, quantize="pq", pq_codebooks=pq_books)
    append_to_ivf_index(part_b, centroids, inc, quantize="pq")
    build_ivf_index(emb, centroids, full, quantize="pq", pq_codebooks=pq_books)
    queries = emb.where(F.col("vec_id") < 8)
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])  # noqa: E731
    for n_probe in (1, len(centroids)):
        got = sorted(map(key, ivf_topk_indexed(spark, inc, queries, centroids, k=3, n_probe=n_probe).collect()))
        want = sorted(map(key, ivf_topk_indexed(spark, full, queries, centroids, k=3, n_probe=n_probe).collect()))
        assert got == want and got, n_probe


def test_fit_pq_grid_codebooks_shape_and_validation():
    from dataflow_python_etl_spark.operators.similarity import fit_pq_grid_codebooks

    books = fit_pq_grid_codebooks()  # dim 64, m 32, levels 8 -> ksub 64
    assert len(books) == 32
    assert all(len(b) == 64 for b in books)
    assert all(len(c) == 2 for b in books for c in b)
    # row-major enumeration: code k decodes to centers (k // 8, k % 8)
    centers = [round(-1.0 + (i + 0.5) * 0.25, 6) for i in range(8)]
    assert books[0][0] == [centers[0], centers[0]]
    assert books[0][1] == [centers[0], centers[1]]
    assert books[0][9] == [centers[1], centers[1]]
    assert books[0][63] == [centers[7], centers[7]]
    # all subspaces share the one grid, but as independent lists
    assert books[1] == books[0] and books[1] is not books[0]
    with pytest.raises(ValueError, match="divisible"):
        fit_pq_grid_codebooks(dim=64, m=7)
    with pytest.raises(ValueError, match="tinyint"):
        fit_pq_grid_codebooks(levels=16)  # 16**2 = 256 codes
    with pytest.raises(ValueError, match="lo < hi"):
        fit_pq_grid_codebooks(lo=1.0, hi=-1.0)


def test_pq_grid_codes_match_argmin_assignment(spark, emb):
    """The closed-form grid encoder must agree with the generic
    nearest-center argmin (_quantize_pq) over the grid codebooks on
    the real corpus — i.e. the grid IS a PQ codebook, the closed form
    is just the O(levels) shortcut. Exact cell-midpoint ties are the
    one documented divergence (grid takes the upper cell, first-wins
    argmin the lower); such rows are filtered and counted."""
    from dataflow_python_etl_spark.functions.vectors import as_double_array
    from dataflow_python_etl_spark.operators.similarity import (
        _quantize_pq,
        fit_pq_grid_codebooks,
        pq_grid_codes,
    )

    books = fit_pq_grid_codebooks()
    assigned = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.lit(0).alias("cid"),
        F.lit(1.0).alias("cn"),
        as_double_array("embedding").alias("cvec"),
    )
    argmin = _quantize_pq(assigned, books).select("neighbor_id", "pq_codes")
    closed = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        pq_grid_codes("embedding").alias("grid_codes"),
        # midpoint tie: some dim lands exactly on a cell boundary
        F.exists(
            as_double_array("embedding"),
            lambda x: ((x - F.lit(-1.0)) / F.lit(0.25))
            == F.floor((x - F.lit(-1.0)) / F.lit(0.25)).cast("double"),
        ).alias("has_tie"),
    )
    joined = argmin.join(closed, "neighbor_id").collect()
    ties = [r for r in joined if r["has_tie"]]
    assert len(ties) <= 2, f"unexpectedly many midpoint ties: {len(ties)}"
    for r in joined:
        if not r["has_tie"]:
            assert list(r["pq_codes"]) == list(r["grid_codes"]), r["neighbor_id"]

