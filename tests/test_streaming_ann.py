"""Streaming ANN index maintenance: embeddings stream into the
cell-partitioned IVF inverted file (the vector leg of the streaming
ingest matrix — text/image/video/audio sinks already exist)."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.similarity import (
    build_ivf_index,
    fit_ivf_centroids,
    fit_pq_grid_codebooks,
    ivf_topk_indexed,
)
from dataflow_python_etl_spark.sources.catalog import read_table
from dataflow_python_etl_spark.streaming.pipeline import (
    apply_ivf_index_batch,
    stream_embeddings_to_ivf_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return fit_ivf_centroids(emb, k=4, max_iter=10)


def _topk(spark, path, queries, centroids):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk_indexed(
            spark, path, queries, centroids, k=3, n_probe=len(centroids)
        ).collect()
    )


@pytest.mark.parametrize("quantize", [None, "pq"])
def test_stream_embeddings_ivf_equals_batch_build(spark, tmp_path, emb, centroids, quantize):
    """Two streamed micro-batches == one batch build over the union:
    identical index rows (up to the ingest_batch bookkeeping column)
    and identical ivf_topk_indexed results at full probe — the
    append ≡ rebuild pin, streaming edition."""
    books = fit_pq_grid_codebooks() if quantize == "pq" else None
    src = str(tmp_path / "vecs_in")
    streamed = str(tmp_path / f"ivf_stream_{quantize}")
    batch_built = str(tmp_path / f"ivf_batch_{quantize}")

    half_a = emb.where(F.col("vec_id") < 250)
    half_b = emb.where(F.col("vec_id") >= 250)
    half_a.coalesce(1).write.parquet(src)  # source dir must exist before readStream
    q = stream_embeddings_to_ivf_index(
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .parquet(src),
        streamed,
        centroids,
        str(tmp_path / f"ckpt_{quantize}"),
        quantize=quantize,
        pq_codebooks=books,
    )
    q.processAllAvailable()
    half_b.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    build_ivf_index(
        emb, centroids, batch_built, quantize=quantize, pq_codebooks=books
    )
    cols = ["neighbor_id", "cid", "cn"] + (["pq_codes"] if quantize else ["cvec"])
    got = sorted(
        tuple(str(r[c]) for c in cols)
        for r in spark.read.parquet(streamed).select(*cols).collect()
    )
    want = sorted(
        tuple(str(r[c]) for c in cols)
        for r in spark.read.parquet(batch_built).select(*cols).collect()
    )
    assert got == want and len(got) == emb.count()

    queries = emb.where(F.col("vec_id") < 5)
    assert _topk(spark, streamed, queries, centroids) == _topk(
        spark, batch_built, queries, centroids
    )


def test_apply_ivf_index_batch_replay_and_guards(spark, tmp_path, emb, centroids):
    """foreachBatch replay semantics, driven directly: an exact batch
    replay is a no-op (watermark short-circuit), a same-batch-id
    rerun after a crash REWRITES its own (cid, ingest_batch)
    partitions (no id dup), and a source-level replay into a FRESH
    batch id is dropped by the monotone-id watermark filter."""
    index = str(tmp_path / "ivf")
    b0 = emb.where(F.col("vec_id") < 100)
    b1 = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 200))

    apply_ivf_index_batch(b0, 0, index, centroids)
    apply_ivf_index_batch(b1, 1, index, centroids)
    baseline = sorted(
        r["neighbor_id"] for r in spark.read.parquet(index).collect()
    )
    assert baseline == list(range(200))

    # crash-window rerun of batch 1 (watermark says batch 1 committed
    # -> no-op); then simulate the wm lagging by one batch: partition
    # overwrite still converges without duplicating ids
    apply_ivf_index_batch(b1, 1, index, centroids)
    import json
    import os

    wm_path = index + ".__ingest_watermark"
    with open(wm_path) as f:
        wm = json.load(f)
    assert wm == {"batch_id": 1, "max_id": 199}
    with open(wm_path, "w") as f:
        json.dump({"batch_id": 0, "max_id": 99}, f)  # wm lost batch 1
    apply_ivf_index_batch(b1, 1, index, centroids)  # replay rewrites
    after = sorted(r["neighbor_id"] for r in spark.read.parquet(index).collect())
    assert after == baseline

    # source replay into a NEW batch id: monotone watermark drops it
    apply_ivf_index_batch(b1, 2, index, centroids)
    after2 = sorted(r["neighbor_id"] for r in spark.read.parquet(index).collect())
    assert after2 == baseline
    with open(wm_path) as f:
        assert json.load(f) == {"batch_id": 2, "max_id": 199}

    # guards
    with pytest.raises(RuntimeError, match="index .* is missing"):
        apply_ivf_index_batch(b1, 3, str(tmp_path / "gone"), centroids)
    with pytest.raises(ValueError, match="quantize mismatch"):
        apply_ivf_index_batch(b1, 3, index, centroids, quantize="int8")
    with pytest.raises(ValueError, match="requires pq_codebooks"):
        apply_ivf_index_batch(b1, 3, index, centroids, quantize="pq")
    with pytest.raises(ValueError, match="replay_guard"):
        apply_ivf_index_batch(b1, 3, index, centroids, replay_guard="ledger")
    os.remove(wm_path)


def test_pq_codebook_drift_guard(spark, tmp_path, emb, centroids):
    """A restart passing different PQ codebooks than the sidecar the
    index was built with must fail loudly — silent re-encoding drift
    would corrupt every later score."""
    index = str(tmp_path / "ivf_pq")
    books = fit_pq_grid_codebooks()
    b0 = emb.where(F.col("vec_id") < 50)
    apply_ivf_index_batch(b0, 0, index, centroids, quantize="pq", pq_codebooks=books)
    other = fit_pq_grid_codebooks(levels=4)
    with pytest.raises(ValueError, match="codebooks .* differ"):
        apply_ivf_index_batch(
            b0, 1, index, centroids, quantize="pq", pq_codebooks=other
        )


def test_streamed_index_self_describing_and_centroid_drift_guard(
    spark, tmp_path, emb, centroids
):
    """The streamed index carries the centroid sidecar from its first
    batch (ivf_topk_indexed(centroids=None) works mid-stream), and a
    restart passing DIFFERENT centroids fails loudly — mixed-quantizer
    cells would silently corrupt probes."""
    from dataflow_python_etl_spark.operators.similarity import (
        fit_ivf_centroids,
        load_ivf_centroids,
    )

    index = str(tmp_path / "ivf")
    b0 = emb.where(F.col("vec_id") < 100)
    apply_ivf_index_batch(b0, 0, index, centroids)
    assert load_ivf_centroids(index) == centroids
    queries = emb.where(F.col("vec_id") < 3)
    got = ivf_topk_indexed(
        spark, index, queries, None, k=3, n_probe=len(centroids)
    ).collect()
    assert len(got) == 3 * 3
    other = fit_ivf_centroids(emb, k=4, max_iter=2, seed=99)
    assert other != centroids
    with pytest.raises(ValueError, match="centroids .* differ"):
        apply_ivf_index_batch(b0, 1, index, other)
