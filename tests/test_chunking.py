"""Document chunking + sequence packing: window/overlap algebra,
token-stream reconstruction, budget capping, oversize rejection."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.chunking import chunk_documents, pack_sequences
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_chunk_documents_window_algebra(spark):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(200)
    out = chunk_documents(docs, chunk_tokens=16, overlap_tokens=4).collect()
    assert out
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r["doc_id"]: r["text"].split() for r in docs.collect() if r["text"].split()}
    assert set(by_doc) == set(originals)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        toks = originals[doc_id]
        for i, r in enumerate(chunks):
            assert r["chunk_id"] == i and r["token_start"] == i * 12
            got = r["chunk_text"].split()
            assert r["n_tokens"] == len(got) <= 16
            # each chunk is exactly the doc's token window at its start
            assert got == toks[r["token_start"] : r["token_start"] + 16]
        # full coverage: last chunk reaches the end of the doc
        last = chunks[-1]
        assert last["token_start"] + last["n_tokens"] == len(toks)
        # no redundant tail: every non-first chunk adds new tokens
        for r in chunks[1:]:
            assert r["token_start"] + 4 < len(toks)


def test_chunk_documents_empty_and_validation(spark):
    docs = spark.createDataFrame([(1, ""), (2, "a b c")], "doc_id: long, text: string")
    out = chunk_documents(docs, chunk_tokens=8, overlap_tokens=2).collect()
    assert [r["doc_id"] for r in out] == [2]  # empty doc -> no chunks
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)


def test_pack_sequences_budget_and_totality(spark):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(300)
    chunks = chunk_documents(docs, chunk_tokens=32, overlap_tokens=0)
    packed = pack_sequences(chunks, budget_tokens=100, order_cols=["doc_id", "chunk_id"])
    rows = packed.collect()
    # totality: every chunk assigned exactly once, payload unchanged
    assert sorted((r["doc_id"], r["chunk_id"]) for r in rows) == sorted(
        (r["doc_id"], r["chunk_id"]) for r in chunks.collect()
    )
    # capacity: no sequence exceeds the budget
    per_seq = (
        packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("tot")).collect()
    )
    assert per_seq and all(r["tot"] <= 100 for r in per_seq)
    # packing actually packs: average fill is well above one chunk per bin
    assert sum(r["tot"] for r in per_seq) / len(per_seq) > 50


def test_pack_sequences_rejects_oversize(spark):
    df = spark.createDataFrame([(1, 10), (2, 999)], "id: long, n_tokens: int")
    with pytest.raises(Exception, match="exceeds budget"):
        pack_sequences(df, budget_tokens=100, order_cols=["id"]).collect()


def test_pack_sequences_deterministic(spark):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(100)
    chunks = chunk_documents(docs, chunk_tokens=32, overlap_tokens=0)
    a = {
        (r["doc_id"], r["chunk_id"]): r["seq_id"]
        for r in pack_sequences(chunks, 128, order_cols=["doc_id", "chunk_id"]).collect()
    }
    b = {
        (r["doc_id"], r["chunk_id"]): r["seq_id"]
        for r in pack_sequences(chunks, 128, order_cols=["doc_id", "chunk_id"]).collect()
    }
    assert a == b
