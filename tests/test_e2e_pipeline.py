"""Capstone e2e: the full pretraining-data pipeline composed from the
engine's operators — curate → chunk → pack → split — one lazy chain
per stage over the real documents table, with the cross-stage
invariants a training job depends on asserted at the end.

This is the composition the LLM-data operators exist for: a user of
the reference engine switching to this repo runs exactly this chain.
"""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.chunking import chunk_documents, pack_sequences
from dataflow_python_etl_spark.operators.corpus import curate_corpus, split_by_group
from dataflow_python_etl_spark.operators.dedup import unpersist_all
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 96


def test_full_training_data_pipeline(spark):
    docs = read_table(spark, SF_DIR, "documents")
    emb = read_table(spark, SF_DIR, "embeddings")
    n_raw = docs.count()

    # 1) curation: PII → quality → syntactic dedup → semantic dedup →
    #    per-domain quota (salted two-phase — the 100 TB spelling)
    curated = curate_corpus(
        docs,
        emb,
        domain_col="source",
        max_per_domain=50,
        quota_salt_buckets=8,
    )
    curated_rows = curated.collect()
    n_curated = len(curated_rows)
    assert 0 < n_curated < n_raw
    # survivors carry the curation outputs the next stages need
    assert {"doc_id", "text", "quality", "n_tokens"} <= set(curated.columns)
    assert all(r["quality"] >= 0.3 for r in curated_rows)
    # PII really is gone from the surviving text
    assert not any("@" in r["text"] for r in curated_rows if r["text"])

    # 2) chunking: fixed windows, 1/8 overlap
    chunks = chunk_documents(
        curated.select("doc_id", "text"), chunk_tokens=64, overlap_tokens=8
    )
    # every curated doc with ≥1 token is represented, nothing else
    chunk_docs = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert chunk_docs == {r["doc_id"] for r in curated_rows if r["n_tokens"] > 0}

    # 3) packing into training sequences
    packed = pack_sequences(
        chunks, BUDGET, order_cols=["doc_id", "chunk_id"]
    )
    per_seq = packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("tot"))
    assert per_seq.where(F.col("tot") > BUDGET).count() == 0
    assert packed.count() == chunks.count()

    # 4) leakage-proof split: a document's chunks never straddle splits
    final = split_by_group(packed, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    cohesion = final.groupBy("doc_id").agg(F.count_distinct("split").alias("k"))
    assert cohesion.where(F.col("k") > 1).count() == 0
    splits = {r["split"] for r in final.select("split").distinct().collect()}
    assert "train" in splits and splits <= {"train", "val", "test"}

    # end-to-end conservation: token mass survives the chain exactly
    # (chunks partition each doc's token stream, overlaps re-counted)
    toks_in_chunks = packed.agg(F.sum("n_tokens")).first()[0]
    toks_curated = sum(r["n_tokens"] for r in curated_rows)
    n_chunks_per_doc = {r["doc_id"]: r["n"] for r in
                        packed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    overlap_mass = sum(8 * (n_chunks_per_doc[r["doc_id"]] - 1)
                       for r in curated_rows if r["doc_id"] in n_chunks_per_doc)
    assert toks_in_chunks == toks_curated + overlap_mass
    unpersist_all()


def test_bpe_budget_chunk_pack_conserves_subtokens(spark):
    """BPE-budget variant of the chunk→pack stages: windows and packing
    budgets are counted in q38's portable subword units, and subtoken
    mass is conserved EXACTLY through both stages (doc subtokens =
    chunk subtokens − re-counted overlap mass)."""
    from dataflow_python_etl_spark.functions.text import bpe_token_count

    OVERLAP, WINDOW, BPE_BUDGET = 8, 64, 96
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    doc_counts = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", bpe_token_count("text").alias("n")).collect()
    }

    chunks = pack_sequences(
        chunk_documents(docs, chunk_tokens=WINDOW, overlap_tokens=OVERLAP, token_mode="bpe"),
        BPE_BUDGET,
        order_cols=["doc_id", "chunk_id"],
    )
    rows = chunks.collect()
    assert rows

    # n_tokens IS the subtoken count of the chunk text (round-trip:
    # space-joined subtokens re-tokenize to themselves)
    recount = chunks.where(
        F.size(F.regexp_extract_all("chunk_text", F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), F.lit(0)))
        != F.col("n_tokens")
    ).count()
    assert recount == 0

    # per-sequence budget holds in SUBTOKEN units
    per_seq = chunks.groupBy("seq_id").agg(F.sum("n_tokens").alias("tot"))
    assert per_seq.where(F.col("tot") > BPE_BUDGET).count() == 0

    # exact conservation per document
    per_doc = {}
    for r in rows:
        a = per_doc.setdefault(r["doc_id"], [0, 0])
        a[0] += r["n_tokens"]
        a[1] += 1
    for doc_id, (mass, n_chunks) in per_doc.items():
        assert mass == doc_counts[doc_id] + OVERLAP * (n_chunks - 1), doc_id
    # every doc with ≥1 subtoken is chunked, nothing else
    assert set(per_doc) == {d for d, n in doc_counts.items() if n > 0}
