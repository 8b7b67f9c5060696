"""Erasure propagation through persisted DERIVED state (VERDICT r10
#1): forgetting a document must remove its terms from the BM25
postings index (sidecar-corrected), its fingerprints from the band
index (bucketed layout preserved), and its raw/quantized vectors from
the IVF index — and sketch MVs, which cannot subtract, must be loudly
tombstoned until rebuilt from the cleansed base. Pins: probe-after-
forget returns nothing for the forgotten id on every surface;
rebuild-equivalence for the search index; idempotent re-run removes
0; refresh-into-tombstone raises."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.erasure import (
    ERASURE_TOMBSTONE,
    forget_everywhere,
    forget_from_ivf_index,
    forget_from_search_index,
    mv_erasure_stale,
    rebuild_mv,
    tombstone_mv,
)

DOCS = [
    (1, "alpha bravo charlie delta echo foxtrot"),
    (2, "bravo charlie delta echo golf hotel"),
    (3, "zanzibar unique nowhere else zanzibar appears"),
    (4, "charlie delta echo india juliet kilo"),
    (5, "lima mike november oscar papa quebec"),
    (6, "romeo sierra tango uniform victor whiskey"),
]
FORGET = [3, 5]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _keys(spark, ids=FORGET, col="doc_id"):
    return spark.createDataFrame([(i,) for i in ids], f"{col}: long")


# ---------------------------------------------------------------- search


def test_search_index_forget_matches_rebuild(spark, tmp_path):
    from dataflow_python_etl_spark.operators.search import (
        build_search_index,
        load_search_stats,
        search_index,
    )

    path = str(tmp_path / "ix")
    build_search_index(_docs(spark), path)
    assert search_index(spark, path, ("zanzibar",)).count() == 1

    before, removed = forget_from_search_index(spark, path, _keys(spark))
    assert removed > 0

    # probe-after-forget: the forgotten doc's unique term finds nothing
    assert search_index(spark, path, ("zanzibar",)).count() == 0
    # and no posting row of any forgotten doc survives
    left = spark.read.parquet(path)
    assert left.where(F.col("doc_id").isin(FORGET)).count() == 0
    assert left.count() == before - removed

    # REBUILD-EQUIVALENCE: postings set AND sidecar equal a fresh
    # build over the cleansed corpus — forget ≡ rebuild
    clean = str(tmp_path / "ix_clean")
    build_search_index(
        _docs(spark, [r for r in DOCS if r[0] not in FORGET]), clean
    )
    assert load_search_stats(path) == load_search_stats(clean)
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(p).collect()
    )
    assert rows(path) == rows(clean)
    # scores identical for a surviving query
    a = search_index(spark, path, ("charlie", "delta")).collect()
    b = search_index(spark, clean, ("charlie", "delta")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a

    # idempotent: second run removes 0
    b2, r2 = forget_from_search_index(spark, path, _keys(spark))
    assert (b2, r2) == (before - removed, 0)


def test_search_index_forget_all_is_loud_not_divide_by_zero(spark, tmp_path):
    from dataflow_python_etl_spark.operators.search import (
        build_search_index,
        load_search_stats,
        search_index,
    )

    path = str(tmp_path / "ix")
    build_search_index(_docs(spark), path)
    forget_from_search_index(
        spark, path, _keys(spark, [r[0] for r in DOCS])
    )
    assert load_search_stats(path)["n_docs"] == 0
    with pytest.raises(ValueError, match="empty"):
        search_index(spark, path, ("charlie",))


# ------------------------------------------------------------------- ivf


def _embeddings(spark, n=40, dim=8):
    rows = [
        (i, [float(((i * 7 + d * 3) % 11) - 5) for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


@pytest.mark.parametrize("quantize", [None, "pq"])
def test_ivf_index_forget(spark, tmp_path, quantize):
    from dataflow_python_etl_spark.operators.similarity import (
        build_ivf_index,
        fit_ivf_centroids,
        fit_pq_codebooks,
        ivf_topk_indexed,
        load_ivf_centroids,
        load_pq_codebooks,
    )

    emb = _embeddings(spark)
    cents = fit_ivf_centroids(emb, k=4)
    path = str(tmp_path / f"ivf_{quantize}")
    kw = {}
    if quantize == "pq":
        kw = {"quantize": "pq", "pq_codebooks": fit_pq_codebooks(emb, m=4, ksub=4)}
    build_ivf_index(emb, cents, path, **kw)

    # a neighbor-of-the-target query returns the target before erasure
    q = emb.where(F.col("vec_id") == 29)  # same residue family as 7
    pre = ivf_topk_indexed(spark, path, q, k=10, n_probe=4)
    assert 7 in {r["neighbor_id"] for r in pre.collect()}

    before, removed = forget_from_ivf_index(spark, path, _keys(spark, [7, 11], "vec_id"))
    assert removed == 2
    left = spark.read.option("basePath", path).parquet(path)
    assert left.where(F.col("neighbor_id").isin([7, 11])).count() == 0
    assert left.count() == before - 2

    # probe-after-forget: same query, forgotten ids gone, probe works
    post = ivf_topk_indexed(spark, path, q, k=10, n_probe=4)
    got = {r["neighbor_id"] for r in post.collect()}
    assert 7 not in got and 11 not in got and got

    # sidecars carried: the index stays self-describing
    assert load_ivf_centroids(path) == cents
    if quantize == "pq":
        assert load_pq_codebooks(path)
    # idempotent
    assert forget_from_ivf_index(spark, path, _keys(spark, [7, 11], "vec_id"))[1] == 0


# ------------------------------------------------------------------ band


def test_band_index_forget_preserves_bucketed_probe(spark, tmp_path):
    from dataflow_python_etl_spark.operators.dedup import (
        BandIndexStore,
        _band_frame,
        minhash_band_index,
        minhash_signatures,
        unpersist_all,
    )
    from dataflow_python_etl_spark.plans.checks import explain_str

    store = BandIndexStore(
        spark, "t_erase_bix", path=str(tmp_path / "bix"), n_buckets=4
    )
    try:
        store.append(minhash_band_index(_docs(spark)))
        per_doc = store.read().groupBy("doc").count().collect()
        n_bands = per_doc[0]["count"]
        assert all(r["count"] == n_bands for r in per_doc)

        before, removed = store.forget(_keys(spark, col="doc"))
        assert before == len(DOCS) * n_bands
        assert removed == len(FORGET) * n_bands
        assert {r["doc"] for r in store.read().select("doc").distinct().collect()} == {
            1, 2, 4, 6,
        }

        # the swap preserved the bucket spec: probe stays co-located
        # with the index side contributing ZERO Exchange (the
        # test_band_index scale pin, re-run post-erasure)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            batch = _docs(spark, [(100, DOCS[0][1])])
            nb = _band_frame(
                minhash_signatures(batch, "doc_id", "text", 3, 32), "doc_id", 32, 4
            ).alias("nb")
            probe = nb.join(
                store.read().alias("ix"),
                (F.col("nb.band") == F.col("ix.band"))
                & (F.col("nb.sig") == F.col("ix.sig")),
            )
            plan = explain_str(probe, "simple")
            assert "Bucketed: true" in plan, plan
            tail = plan[plan.index("FileScan parquet") :]
            assert "Exchange" not in tail, plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

        # idempotent; appends still work after the swap (spec intact)
        assert store.forget(_keys(spark, col="doc"))[1] == 0
        store.append(minhash_band_index(_docs(spark, [(9, "entirely new appended doc")])))
        assert store.read().where(F.col("doc") == 9).count() == n_bands
        unpersist_all()
    finally:
        store.drop()


def test_band_index_forget_survives_stale_tmp_table(spark, tmp_path):
    """Crash leftover: a previous forget died after creating the tmp
    catalog entry — the next forget must drop it up front and
    complete."""
    from dataflow_python_etl_spark.operators.dedup import (
        BandIndexStore,
        minhash_band_index,
    )

    store = BandIndexStore(
        spark, "t_erase_bix2", path=str(tmp_path / "bix"), n_buckets=4
    )
    try:
        store.append(minhash_band_index(_docs(spark)))
        # simulate the crash leftover
        spark.createDataFrame([(1,)], "x: long").write.saveAsTable(
            "t_erase_bix2__fk_tmp"
        )
        before, removed = store.forget(_keys(spark, col="doc"))
        assert removed > 0
        assert not spark.catalog.tableExists("t_erase_bix2__fk_tmp")
    finally:
        store.drop()


# ---------------------------------------------------------------- sketch


def test_sketch_mv_tombstone_blocks_refresh_until_rebuild(spark, tmp_path):
    from dataflow_python_etl_spark.operators.sketches import kmv_sketches
    from dataflow_python_etl_spark.operators.upsert import refresh_kmv_agg

    mv = str(tmp_path / "kmv_mv")
    ev = spark.createDataFrame(
        [("a", i) for i in range(20)] + [("b", i) for i in range(5)],
        "grp: string, user_id: long",
    )
    # build via the refresh path itself
    s0 = kmv_sketches(ev, "grp", "user_id", k=8)
    refresh_kmv_agg(spark, mv, s0, key_cols=["set_id"], k=8)
    assert not mv_erasure_stale(mv)

    tombstone_mv(mv, "user 3 forgotten")
    assert mv_erasure_stale(mv)
    with pytest.raises(RuntimeError, match="tombstoned"):
        refresh_kmv_agg(spark, mv, s0, key_cols=["set_id"], k=8)

    # rebuild from the cleansed base clears the marker atomically
    clean = ev.where(F.col("user_id") != 3)
    rebuild_mv(kmv_sketches(clean, "grp", "user_id", k=8), mv)
    assert not mv_erasure_stale(mv)
    refresh_kmv_agg(
        spark, mv, kmv_sketches(clean, "grp", "user_id", k=8), key_cols=["set_id"], k=8
    )


def test_additive_refresh_blocked_by_tombstone(spark, tmp_path):
    from dataflow_python_etl_spark.operators.upsert import refresh_additive_agg

    mv = str(tmp_path / "add_mv")
    b = spark.createDataFrame([("x", 3)], "grp: string, n: long")
    refresh_additive_agg(spark, mv, b, key_cols=["grp"])
    tombstone_mv(mv, "erasure")
    with pytest.raises(RuntimeError, match="tombstoned"):
        refresh_additive_agg(spark, mv, b, key_cols=["grp"])


# ------------------------------------------------------------ everywhere


def test_forget_everywhere_one_audit_all_surfaces(spark, tmp_path):
    from dataflow_python_etl_spark.operators.dedup import (
        BandIndexStore,
        minhash_band_index,
    )
    from dataflow_python_etl_spark.operators.search import build_search_index
    from dataflow_python_etl_spark.operators.sketches import kmv_sketches
    from dataflow_python_etl_spark.operators.similarity import (
        build_ivf_index,
        fit_ivf_centroids,
    )
    from dataflow_python_etl_spark.operators.upsert import refresh_kmv_agg

    docs_path = str(tmp_path / "docs")
    _docs(spark).write.parquet(docs_path)
    six = str(tmp_path / "search")
    build_search_index(_docs(spark), six)
    store = BandIndexStore(
        spark, "t_erase_all", path=str(tmp_path / "bix"), n_buckets=4
    )
    store.append(minhash_band_index(_docs(spark)))
    emb = spark.createDataFrame(
        [(r[0], [float(r[0]), 1.0]) for r in DOCS], "vec_id: long, embedding: array<double>"
    )
    ivf = str(tmp_path / "ivf")
    build_ivf_index(emb, fit_ivf_centroids(emb, k=2), ivf)
    mv = str(tmp_path / "mv")
    refresh_kmv_agg(
        spark,
        mv,
        kmv_sketches(_docs(spark), "text", "doc_id", k=4),
        key_cols=["set_id"],
        k=4,
    )

    try:
        audit = forget_everywhere(
            spark,
            _keys(spark),
            key_col="doc_id",
            tables=[(docs_path, "doc_id")],
            search_indexes=[six],
            band_indexes=[store],
            ivf_indexes=[(ivf, "vec_id")],
            sketch_mvs=[mv],
        ).collect()
        by = {(r["surface"], r["target"]): r for r in audit}
        assert len(audit) == 5
        assert by[("table", docs_path)]["rows_removed"] == len(FORGET)
        assert by[("search_index", six)]["rows_removed"] > 0
        assert by[("band_index", "t_erase_all")]["rows_removed"] > 0
        assert by[("ivf_index", ivf)]["rows_removed"] == len(FORGET)
        ts = by[("sketch_mv", mv)]
        assert ts["action"] == "tombstoned" and ts["rows_removed"] is None
        assert mv_erasure_stale(mv)
        for r in audit:
            if r["action"] == "deleted":
                assert r["rows_after"] == r["rows_before"] - r["rows_removed"]

        # nothing anywhere references a forgotten id
        assert (
            spark.read.parquet(docs_path).where(F.col("doc_id").isin(FORGET)).count()
            == 0
        )
        assert (
            spark.read.parquet(six).where(F.col("doc_id").isin(FORGET)).count() == 0
        )
        assert store.read().where(F.col("doc").isin(FORGET)).count() == 0
        assert (
            spark.read.option("basePath", ivf)
            .parquet(ivf)
            .where(F.col("neighbor_id").isin(FORGET))
            .count()
            == 0
        )

        # idempotent: the re-run removes 0 on every deleted surface
        again = forget_everywhere(
            spark,
            _keys(spark),
            key_col="doc_id",
            tables=[(docs_path, "doc_id")],
            search_indexes=[six],
            band_indexes=[store],
            ivf_indexes=[(ivf, "vec_id")],
            sketch_mvs=[mv],
        ).collect()
        assert all(
            r["rows_removed"] == 0 for r in again if r["action"] == "deleted"
        )
    finally:
        store.drop()
