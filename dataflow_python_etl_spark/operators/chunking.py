"""Training-sequence preparation: document chunking and sequence
packing (SURVEY.md §2.4 extension family — the step between a curated
corpus and a tokenizer/dataloader).

- ``chunk_documents``: split each document's token stream into
  overlapping fixed-size windows. Pure JVM expressions (split →
  filtered start sequence → slice inside one generator), so the text
  column is scanned once per document, never per chunk, and the
  operator is a zero-shuffle map over the corpus at any scale.
- ``pack_sequences``: greedy next-fit bin-packing of chunks into
  training sequences of at most ``budget_tokens``. Packing has
  sequential state (the running fill), so it runs per PARTITION via
  an Arrow ``mapInPandas`` kernel over content-hash-partitioned
  input — embarrassingly parallel, one pass, no shuffle beyond the
  initial partitioning; bin ids are globally unique by construction
  (partition_id << 32 | local bin) and the whole assignment is
  identical across separate runs (no sampled boundaries anywhere).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from dataflow_python_etl_spark.functions.text import bpe_tokens, tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    token_mode: str = "whitespace",
) -> DataFrame:
    """(id, chunk_id, token_start, n_tokens, chunk_text): overlapping
    token windows of ``chunk_tokens``, stepping by
    ``chunk_tokens − overlap_tokens``.

    ``token_mode="bpe"`` budgets windows in the portable BPE-ish
    subword units of q38 (``functions.text.bpe_tokens``) instead of
    whitespace words — whitespace counts understate real tokenizer
    budgets by 1.3–1.5× on punctuated text, so sequences packed from
    whitespace-budgeted chunks can overflow the actual training
    context window. Both modes are the same single-Generate JVM plan
    (pinned); BPE chunk_text space-joins the subtokens, which
    re-tokenizes to the identical subtoken stream (``BPE_RE`` classes
    are disjoint and whitespace-free).

    Window rule: starts are 0, step, 2·step, …; a start whose window
    would be fully contained in the previous one (start + overlap ≥
    doc length, i.e. it contributes only already-covered tokens) is
    not emitted, so the final chunk may be short but is never
    redundant. Documents with no tokens produce no chunks.

    Catalyst shape: the token array is computed in a projection BELOW
    the Generate and consumed only by the generator, so the split runs
    EXACTLY once per document (plan-pinned): a sibling projection
    would re-run it per output chunk (the measured pitfall in
    docs/SCALE.md), and a ``where(size > 0)`` empty-doc pre-filter
    would make Catalyst re-derive the split a second time inside the
    pushed Filter — instead, empty docs are excluded by the start
    filter itself (posexplode of an empty array emits no rows).
    Per-chunk values (slice, size, join) are built inside the
    generator's struct.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    if token_mode not in ("whitespace", "bpe"):
        raise ValueError(f"token_mode must be whitespace|bpe, got {token_mode!r}")
    step = chunk_tokens - overlap_tokens
    if token_mode == "bpe":
        toks = bpe_tokens(text_col)
    else:
        toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step)),
        lambda s: ((s == F.lit(0)) & (n > 0)) | (s + F.lit(overlap_tokens) < n),
    )
    gen = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.slice(F.col("__toks"), s + 1, chunk_tokens).alias("toks"),
        ),
    )
    return (
        base.select(F.col(id_col), F.posexplode(gen).alias("chunk_id", "c"))
        .select(
            id_col,
            "chunk_id",
            F.col("c.start").alias("token_start"),
            F.size("c.toks").alias("n_tokens"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    budget_tokens: int,
    order_cols: list[str],
    count_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every chunk to a training sequence (``seq_id``) such
    that each sequence's total ``count_col`` is ≤ ``budget_tokens``
    (greedy next-fit in ``order_cols`` order). Output = input columns
    + ``seq_id`` (long).

    ``order_cols`` must be a TOTAL order over the rows (e.g.
    ``["doc_id", "chunk_id"]`` for :func:`chunk_documents` output) —
    it is required, not defaulted, because packing under a partial
    order is nondeterministic: ties would pack in shuffle-arrival
    order, so reruns (or a retried task) would emit different
    sequences. Rows larger than the budget are REJECTED loudly
    (truncation is a chunking decision, not a packing one — re-chunk
    with ``chunk_tokens ≤ budget``).

    Scale shape: packing state is a single running counter, so the
    corpus is partitioned by a CONTENT HASH of the leading
    ``order_cols`` entry (``pmod(murmur3(key), N)`` — all chunks of a
    document land together) and each partition packs independently in
    total ``order_cols`` order in one Arrow pass — next-fit quality
    within a partition, zero coordination across partitions. The only
    cross-partition effect is at most one under-filled final sequence
    PER PARTITION, which for 10⁴-row-plus partitions is noise. Bin
    ids are unique without coordination:
    ``partition_id << 32 | local_bin``.

    Determinism: the (row → seq_id) assignment is IDENTICAL across
    reruns, task retries, and upstream repartitionings, because every
    input to it is content-derived: the partition index is a fixed
    hash of the leading order key (no sampled range boundaries — the
    pre-round-5 ``repartitionByRange`` drew boundaries from a sample
    of the input layout, so separate runs could regroup sequences
    near a boundary), the within-partition order is the total
    ``order_cols`` sort, and ``num_partitions`` is pinned explicitly
    into the shuffle (AQE does not re-coalesce a user-specified
    count). Cross-run identity holds for the same data and the same
    ``num_partitions`` (defaulted from ``spark.sql.shuffle.partitions``
    — pass it explicitly when comparing across differently-configured
    sessions). The trade vs range partitioning: partitions no longer
    hold globally contiguous key ranges, which next-fit does not need
    — it only needs a stable total order within each partition.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    if not order_cols:
        raise ValueError("pack_sequences requires a total-order order_cols")
    if num_partitions is None:
        num_partitions = int(
            chunks.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    # fresh StructType: .add() on df.schema would mutate the cached
    # schema object of the input DataFrame
    out_schema = StructType(list(chunks.schema.fields) + [StructField("seq_id", LongType())])
    oversize = F.col(count_col) > budget_tokens
    guarded = chunks.where(
        F.when(
            oversize,
            F.raise_error(
                F.concat(
                    F.lit(f"pack_sequences: row exceeds budget {budget_tokens}: "),
                    F.col(count_col).cast("string"),
                    F.lit(" tokens"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    # partition index = pmod(murmur3(leading key), N): content-derived,
    # so identical across runs; hashing ONLY the leading column keeps
    # all chunks of one document in one partition (packing locality)
    parts = guarded.repartition(num_partitions, F.col(order_cols[0])).sortWithinPartitions(
        *order_cols
    )

    def _pack(it: Iterator) -> Iterator:
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local_bin, fill = 0, 0
        for pdf in it:
            seq_ids = []
            for c in pdf[count_col]:
                if fill + int(c) > budget_tokens:
                    local_bin += 1
                    fill = 0
                fill += int(c)
                seq_ids.append((pid << 32) | local_bin)
            out = pdf.copy()
            out["seq_id"] = pd.Series(seq_ids, index=pdf.index, dtype="int64")
            yield out

    return parts.mapInPandas(_pack, out_schema)


# ---------------------------------------------------------------------------
# Training shards: content-addressed shard assignment + manifest + writer
# ---------------------------------------------------------------------------

def shard_assign(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard-v1",
) -> DataFrame:
    """Add a deterministic ``shard_id`` (long in ``[0, n_shards)``) —
    the portable md5 hash of ``salt ++ id`` mod ``n_shards``.

    Content-addressed (no global sort, no sampled range boundaries,
    no RNG): a document's shard depends only on its id and the salt,
    so reruns, retries, and corpus growth never move an existing
    document between shards — the property a resumable 100 TB shard
    writer needs (appending new docs touches only the shards they
    hash into). Zero-shuffle map-side projection; shard sizes are
    statistically uniform (60-bit hash), not exactly equal — exact
    equality would require a global rank, i.e. a total-order shuffle,
    which buys nothing for a training dataloader.
    """
    from dataflow_python_etl_spark.functions.text import md5_hash60

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return docs.withColumn(
        "shard_id",
        F.pmod(
            md5_hash60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            F.lit(n_shards),
        ),
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard-v1",
    binary_cols: list[str] | None = None,
) -> DataFrame:
    """Per-shard accounting for a training-data export: ``(shard_id,
    n_docs, n_tokens, n_chars, checksum)`` — plus
    ``n_payload_bytes`` when ``binary_cols`` names multimodal payload
    columns (images/audio as opaque ``binary``; real corpora ship
    interleaved text+binary rows).

    ``checksum`` is the bit-XOR of each document's 60-bit content
    hash (md5 of ``"ck-v1:" ++ id ++ ":" ++ text``): order-independent
    and associative, so it map-side-combines, never overflows, and
    detects any changed/missing/extra document in a shard — the
    cheap end-to-end integrity check a dataloader runs against the
    manifest before training. With ``binary_cols``, each payload's
    md5 hex (NULL → a fixed sentinel, distinct from the empty bytes'
    md5) is concatenated into the hashed content, so a flipped BYTE
    in any payload changes the shard checksum exactly like a text
    edit would — same XOR algebra, same map-side combine. One
    hash-aggregate keyed on ``shard_id`` (a single shuffle of ≤
    ``n_shards`` partial rows per task); every term is an exact
    integer, so the manifest is bit-identical across engines and
    runs.
    """
    assigned = shard_assign(docs, n_shards, id_col, salt)
    from dataflow_python_etl_spark.functions.text import md5_hash60, token_count

    bins = list(binary_cols or [])
    missing = [c for c in bins if c not in docs.columns]
    if missing:
        raise ValueError(f"binary_cols absent from frame: {missing}")
    content = [
        F.lit("ck-v1:"),
        F.col(id_col).cast("string"),
        F.lit(":"),
        # NULL text must still be covered: concat null-propagates, so
        # an unguarded text column would NULL the whole doc hash and
        # bit_xor would silently SKIP the row — its payloads could
        # then corrupt without moving the shard checksum (review-
        # caught; exactly the image-only rows binary_cols ships).
        # Sentinel is distinct from the empty string.
        F.coalesce(F.col(text_col), F.lit("<null-text>")),
    ]
    for b in bins:
        content += [F.lit(":"), F.coalesce(F.md5(F.col(b)), F.lit("<null-payload>"))]
    doc_ck = md5_hash60(F.concat(*content))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        # coalesce: a shard of text-NULL (image-only) rows reports 0
        # tokens/chars, not NULL
        F.coalesce(F.sum(token_count(text_col)), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0)).cast("long").alias("n_chars"),
        F.bit_xor(doc_ck).alias("checksum"),
    ]
    if bins:
        n_bytes = sum(
            (F.coalesce(F.length(F.col(b)), F.lit(0)).cast("long") for b in bins),
            F.lit(0).cast("long"),
        )
        aggs.append(F.sum(n_bytes).cast("long").alias("n_payload_bytes"))
    return assigned.groupBy("shard_id").agg(*aggs)


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard-v1",
    binary_cols: list[str] | None = None,
) -> DataFrame:
    """Export a corpus as ``n_shards`` hash-sharded parquet
    partitions (``shard_id=K/`` dirs) plus a ``_manifest`` sidecar,
    and return the manifest DataFrame.

    The write goes through ``operators.upsert.write_and_swap`` (the
    repo's single crash-safe overwrite path) with
    ``partition_by=["shard_id"]``, so a dataloader listing
    ``shard_id=K`` sees either the old export or the complete new one,
    never a torn mix. The manifest is written INSIDE the swapped
    table dir (``_``-prefixed: Spark scans skip it) from the same
    assignment expression, so manifest and data cannot drift. A
    reader verifies a shard by recomputing :func:`shard_manifest`
    over the partition and comparing checksums (pinned in tests).

    ``binary_cols`` ships multimodal corpora: binary payload columns
    (images/audio) ride the same parquet rows — parquet stores
    binary natively, the shard assignment stays content-addressed on
    the id, and the manifest checksum covers every payload byte (see
    :func:`shard_manifest`), so a dataloader verifies interleaved
    text+image shards with the same one XOR pass. Byte-exact
    round-trip through the real codecs is pinned in tests.
    """
    import os

    from dataflow_python_etl_spark.operators.upsert import write_and_swap

    assigned = shard_assign(docs, n_shards, id_col, salt)
    manifest = shard_manifest(docs, n_shards, id_col, text_col, salt, binary_cols)

    def _manifest_into(tmp_dir: str) -> None:
        # sidecar written into the TMP dir so the swap publishes data
        # and manifest in one rename — a crash can never expose an
        # export without its manifest; "_" prefix keeps it out of any
        # parquet scan of the table itself
        manifest.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp_dir, "_manifest")
        )

    write_and_swap(
        assigned, path, partition_by=["shard_id"], pre_swap=_manifest_into
    )
    return manifest
