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


def test_pack_sequences_layout_invariant(spark):
    """The (row → seq_id) assignment must not depend on the UPSTREAM
    physical layout — the exact nondeterminism the sampled
    repartitionByRange had (boundaries drawn from the input sample).
    Same data through three very different layouts → identical
    packing, partition count pinned explicitly."""
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(150)
    chunks = chunk_documents(docs, chunk_tokens=32, overlap_tokens=0)

    def assignment(df):
        return {
            (r["doc_id"], r["chunk_id"]): r["seq_id"]
            for r in pack_sequences(
                df, 128, order_cols=["doc_id", "chunk_id"], num_partitions=8
            ).collect()
        }

    base = assignment(chunks)
    assert base
    scrambled = assignment(
        chunks.orderBy(F.rand(seed=7)).repartition(3)
    )  # arrival order + partitioning both perturbed
    coalesced = assignment(chunks.coalesce(1))
    assert base == scrambled == coalesced


def test_pack_sequences_identical_across_sessions(tmp_path):
    """THE cross-run pin: two separate Spark sessions (separate JVMs,
    separate processes) produce byte-identical (doc_id, chunk_id,
    seq_id) assignments. Runs the same packing in two subprocesses
    and compares an md5 over the sorted assignment."""
    import subprocess
    import sys

    script = """
import hashlib
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dataflow_python_etl_spark.operators.chunking import chunk_documents, pack_sequences
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
    "doc_id", "text"
).limit(120)
chunks = chunk_documents(docs, chunk_tokens=32, overlap_tokens=0)
rows = pack_sequences(chunks, 128, order_cols=["doc_id", "chunk_id"]).collect()
h = hashlib.md5()
for t in sorted((r["doc_id"], r["chunk_id"], r["seq_id"]) for r in rows):
    h.update(repr(t).encode())
print("ASSIGNMENT_MD5=" + h.hexdigest())
spark.stop()
"""
    digests = []
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("ASSIGNMENT_MD5=")
        ]
        assert line, proc.stdout[-2000:]
        digests.append(line[0])
    assert digests[0] == digests[1]


def test_pack_sequences_plan_shape(spark):
    """Single content-hash exchange feeding one Arrow stage — no
    sampled range partitioning, no row-at-a-time Python."""
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str

    docs = (
        read_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 50)  # limit() would add its own exchange
    )
    chunks = chunk_documents(docs, chunk_tokens=32, overlap_tokens=0)
    packed = pack_sequences(chunks, 128, order_cols=["doc_id", "chunk_id"])
    plan = explain_str(packed, "simple")
    assert count_exchanges(packed) == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "hashpartitioning" in plan.lower(), plan
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan and "EvalPython" not in plan.replace(
        "ArrowEvalPython", ""
    ), plan


def test_chunk_documents_properties_randomized(spark):
    """Property sweep over arbitrary token streams: coverage (every
    token index falls in some chunk), window exactness, no redundant
    tails, and correct handling of whitespace-only docs — for many
    (doc length, chunk, overlap) combinations at once."""
    import random

    rng = random.Random(20260813)
    cases = []
    did = 0
    for chunk, overlap in [(4, 0), (5, 2), (8, 7), (16, 4), (64, 16)]:
        for n_tok in [0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 63, 64, 65, 200]:
            did += 1
            text = " ".join(f"t{rng.randint(0, 9)}x{i}" for i in range(n_tok))
            cases.append((did, chunk, overlap, n_tok, text))
    df = spark.createDataFrame(
        [(i, t) for i, _, _, _, t in cases], "doc_id: long, text: string"
    )
    by_case = {i: (c, o, n, t) for i, c, o, n, t in cases}
    for chunk, overlap in [(4, 0), (5, 2), (8, 7), (16, 4), (64, 16)]:
        ids = [i for i, (c, o, _, _) in by_case.items() if (c, o) == (chunk, overlap)]
        sub = df.where(F.col("doc_id").isin(ids))
        rows = chunk_documents(sub, chunk_tokens=chunk, overlap_tokens=overlap).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append(r)
        for i in ids:
            _, _, n_tok, text = by_case[i]
            toks = text.split()
            chunks = sorted(got.get(i, []), key=lambda r: r["chunk_id"])
            if n_tok == 0:
                assert chunks == []
                continue
            step = chunk - overlap
            covered = set()
            for j, r in enumerate(chunks):
                assert r["chunk_id"] == j and r["token_start"] == j * step
                body = r["chunk_text"].split()
                assert body == toks[r["token_start"] : r["token_start"] + chunk]
                assert r["n_tokens"] == len(body)
                covered.update(range(r["token_start"], r["token_start"] + len(body)))
                if j > 0:  # non-redundant: contributes unseen tokens
                    assert r["token_start"] + overlap < n_tok
            assert covered == set(range(n_tok))  # full coverage, no gaps


def test_bpe_chunk_text_roundtrips(spark):
    """The q51 foundation as a property: for arbitrary text, the BPE
    chunk_text (space-joined subtokens) re-tokenizes to exactly its
    own subtoken run — BPE_RE's classes are disjoint and
    whitespace-free, so joining with spaces is lossless in token
    space."""
    from hypothesis import given, settings, strategies as st

    import re

    from dataflow_python_etl_spark.functions.text import BPE_RE

    pat = re.compile(BPE_RE)

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]), max_size=120))
    def check(text):
        toks = pat.findall(text.lower()) if False else pat.findall(text)
        joined = " ".join(toks)
        assert pat.findall(joined) == toks

    check()


def test_bpe_chunk_spark_matches_python_re(spark):
    """Spark's regexp_extract_all over BPE_RE agrees with Python re on
    the real documents table — the cross-engine base q51/q38 rest on."""
    import re

    from dataflow_python_etl_spark.functions.text import BPE_RE, bpe_tokens
    from dataflow_python_etl_spark.sources.catalog import read_table

    pat = re.compile(BPE_RE)
    rows = (
        read_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text", bpe_tokens("text").alias("toks"))
        .collect()
    )
    assert rows
    for r in rows:
        assert list(r["toks"]) == pat.findall(r["text"]), r["doc_id"]


def test_shard_assign_range_determinism_growth_stability(spark):
    from dataflow_python_etl_spark.operators.chunking import shard_assign

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    full = {
        r["doc_id"]: r["shard_id"] for r in shard_assign(docs, 8).collect()
    }
    assert full and all(0 <= s < 8 for s in full.values())
    assert len(set(full.values())) == 8  # all shards populated
    # growth stability: hashing a SUBSET assigns the same shards
    sub = {
        r["doc_id"]: r["shard_id"]
        for r in shard_assign(docs.limit(50), 8).collect()
    }
    assert all(full[d] == s for d, s in sub.items())
    with pytest.raises(ValueError, match="n_shards"):
        shard_assign(docs, 0)


def test_write_training_shards_manifest_roundtrip(spark, tmp_path):
    """Sidecar manifest == manifest recomputed from the written
    partitions; a mutated document flips its shard's checksum."""
    from dataflow_python_etl_spark.operators.chunking import (
        shard_manifest,
        write_training_shards,
    )

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(300)
    path = str(tmp_path / "shards")
    manifest = {
        r["shard_id"]: r for r in write_training_shards(docs, path, 4).collect()
    }
    assert set(manifest) == {0, 1, 2, 3}
    back = spark.read.parquet(path)  # _manifest skipped by scan
    assert back.count() == 300
    # recompute the manifest FROM the exported files
    again = {
        r["shard_id"]: r for r in shard_manifest(back, 4).collect()
    }
    for sid, row in manifest.items():
        for c in ("n_docs", "n_tokens", "n_chars", "checksum"):
            assert again[sid][c] == row[c], (sid, c)
    side = {r["shard_id"]: r for r in spark.read.parquet(f"{path}/_manifest").collect()}
    assert {s: r["checksum"] for s, r in side.items()} == {
        s: r["checksum"] for s, r in manifest.items()
    }
    # integrity: one changed document flips exactly its shard's checksum
    mutated = back.withColumn(
        "text",
        F.when(F.col("doc_id") == back.first()["doc_id"], F.lit("tampered"))
        .otherwise(F.col("text")),
    )
    bad = {r["shard_id"]: r["checksum"] for r in shard_manifest(mutated, 4).collect()}
    diff = [s for s in manifest if bad[s] != manifest[s]["checksum"]]
    assert len(diff) == 1


def test_multimodal_shards_roundtrip_byte_exact(spark, tmp_path):
    """Interleaved text+image corpus through write_training_shards
    (binary_cols): payloads ride the parquet rows byte-exact and
    decode back through the real codecs; the embedded manifest
    equals a recompute over the written table; a single flipped
    payload BYTE flips exactly its shard's checksum (payload bytes
    are covered by the XOR, not just text)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.chunking import (
        shard_manifest,
        write_training_shards,
    )
    from dataflow_python_etl_spark.operators.codecs import decode_image
    from dataflow_python_etl_spark.operators.multimodal import (
        synthetic_image_corpus,
    )
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = (
        read_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .where(F.length("text") > 0)
        .limit(40)
    )
    imgs = synthetic_image_corpus(docs).where(F.col("variant") == 0)
    corpus = docs.join(imgs.select("doc_id", "payload"), "doc_id").select(
        "doc_id", "text", F.col("payload").alias("image")
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        corpus, path, 4, binary_cols=["image"]
    )
    wrote = {r["shard_id"]: r.asDict() for r in manifest.collect()}
    assert set(manifest.columns) == {
        "shard_id", "n_docs", "n_tokens", "n_chars", "checksum", "n_payload_bytes"
    }

    back = spark.read.parquet(path)
    # manifest == recompute over what was actually written
    redo = {
        r["shard_id"]: r.asDict()
        for r in shard_manifest(back, 4, binary_cols=["image"]).collect()
    }
    assert redo == wrote
    # payload bytes survive the shard write byte-exact, and the REAL
    # codec decodes them to the same pixels as the pre-write payload
    orig = {r["doc_id"]: bytes(r["image"]) for r in corpus.collect()}
    got = {r["doc_id"]: bytes(r["image"]) for r in back.collect()}
    assert got == orig
    some = next(iter(orig))
    mime_a, px_a = decode_image(orig[some])
    mime_b, px_b = decode_image(got[some])
    assert mime_a == mime_b == "image/png"
    assert np.array_equal(px_a, px_b) and px_a.shape == (32, 32)

    # a one-BYTE payload edit flips exactly that doc's shard checksum
    victim = back.orderBy("doc_id").limit(1).collect()[0]
    mutated = back.withColumn(
        "image",
        F.when(
            F.col("doc_id") == victim["doc_id"],
            F.concat(F.expr("substring(image, 1, length(image) - 1)"), F.lit(b"\x00")),
        ).otherwise(F.col("image")),
    )
    bad = {
        r["shard_id"]: r["checksum"]
        for r in shard_manifest(mutated, 4, binary_cols=["image"]).collect()
    }
    flipped = [s for s in wrote if bad[s] != wrote[s]["checksum"]]
    assert flipped == [victim["shard_id"]]

    # NULL payload is legal (text-only row in a multimodal corpus)
    # and distinct from empty bytes
    mixed = corpus.withColumn(
        "image", F.when(F.col("doc_id") == victim["doc_id"], F.lit(None)).otherwise(F.col("image"))
    )
    m_null = shard_manifest(mixed, 4, binary_cols=["image"]).collect()
    empty = corpus.withColumn(
        "image", F.when(F.col("doc_id") == victim["doc_id"], F.lit(b"")).otherwise(F.col("image"))
    )
    m_empty = shard_manifest(empty, 4, binary_cols=["image"]).collect()
    ck = lambda rows, s: next(r["checksum"] for r in rows if r["shard_id"] == s)  # noqa: E731
    assert ck(m_null, victim["shard_id"]) != ck(m_empty, victim["shard_id"])

    import pytest

    with pytest.raises(ValueError, match="binary_cols absent"):
        shard_manifest(corpus, 4, binary_cols=["nope"])


def test_shard_checksum_covers_payload_of_text_null_rows(spark):
    """Review-caught: concat null-propagates, so an unguarded text
    column NULLed the whole doc hash and bit_xor silently SKIPPED
    image-only rows — their payloads could corrupt without moving
    the shard checksum. Pinned: flipping a payload byte on a
    text-NULL row flips its shard's checksum; text-NULL-only shards
    report 0 tokens/chars, not NULL."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.chunking import shard_manifest

    rows = [(1, None, b"\x01\x02\x03"), (2, "has text", b"\x04\x05")]
    df = spark.createDataFrame(rows, "doc_id long, text string, image binary")
    base = {r["shard_id"]: r for r in shard_manifest(df, 2, binary_cols=["image"]).collect()}
    flipped = spark.createDataFrame(
        [(1, None, b"\x01\x02\xff"), rows[1]], "doc_id long, text string, image binary"
    )
    after = {r["shard_id"]: r for r in shard_manifest(flipped, 2, binary_cols=["image"]).collect()}
    # doc 1's shard checksum moved; every n_* stays defined (never NULL)
    moved = [s for s in base if base[s]["checksum"] != after[s]["checksum"]]
    assert len(moved) == 1
    assert all(r["n_tokens"] is not None and r["n_chars"] is not None for r in base.values())
