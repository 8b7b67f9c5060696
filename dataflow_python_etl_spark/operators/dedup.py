"""Deduplication operators for training-data pipelines
(BASELINE.json north star; SURVEY.md §2.4).

Scale design notes (100 TB):
- Exact dedup is a hash aggregation on the dedup key — one shuffle,
  map-side partial aggregation, AQE coalesces the reduce side.
- N-gram Jaccard builds an inverted index (shingle → docs) and joins
  it with itself: the join key is the shingle, so only docs sharing a
  shingle ever meet — no cross join. Hot shingles are the skew risk;
  ``max_shingle_df`` drops shingles whose document frequency exceeds a
  cap (a standard trick: ubiquitous shingles contribute little to
  Jaccard but quadratic join fan-out).
- MinHash/LSH replaces the exact inverted index with banded
  signatures: candidate pairs only form inside an LSH bucket, then
  are verified with exact Jaccard. Per-doc work is O(shingles ×
  permutations) map-side; the only shuffle key is (band, signature).

Algorithms are the standard public constructions: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
1997), banded LSH (Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets" ch. 3), SimHash (Charikar, "Similarity estimation
techniques from rounding algorithms", 2002).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataflow_python_etl_spark.functions.text import shingles, tokens


# Operator-internal caches (the exploded shingle streams). Spark can't
# unpersist before the lazy result is consumed, so operators register
# their caches here and callers (bench, long-lived services) reclaim
# storage with unpersist_all() between queries.
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_all() -> int:
    """Release every cache registered by dedup operators; returns count."""
    n = 0
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
            n += 1
        except Exception:
            pass
    return n


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per duplicate group.

    Deterministic (unlike ``dropDuplicates``, which keeps an arbitrary
    row). Returns one row per distinct key with ``n_dups``.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .select(id_col, *key_cols, "n_dups")
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, shingle) with per-doc-distinct shingles.

    Dedup happens IN-ARRAY (``array_distinct``) before the explode, so
    no ``distinct()`` shuffle is ever needed. Deliberately does NOT
    also project ``size(...)``: any sibling expression over the same
    array would be re-evaluated per EXPLODED row (Generate evaluates
    the generator once per input row, but a collapsed projection next
    to it re-runs the whole shingle pipeline per output row — measured
    20× slowdown). Set sizes are re-derived with a cheap count.
    """
    shs = F.array_distinct(shingles(text_col, n))
    return df.select(F.col(id_col).alias("doc"), F.explode(shs).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram-set Jaccard ≥ threshold.

    Inverted-index self-join: explode distinct shingles, join on the
    shingle, count common shingles per pair, then
    ``jaccard = |A∩B| / (|A| + |B| - |A∩B|)``. Returns
    ``(doc_a, doc_b, jaccard)`` with ``doc_a < doc_b``.
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").count().where(F.col("count") > max_shingle_df)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    # The exploded stream feeds BOTH sides of the self-join; caching it
    # makes the (expensive, interpreted-HOF) shingle pipeline run once.
    # MEMORY_AND_DISK: spills instead of OOMing at scale.
    sh = _persist(sh)
    if max_shingle_df is not None:
        # Jaccard must be computed over the SAME (filtered) shingle
        # sets as the intersection counts — deriving sizes from the
        # unfiltered base table would understate every pair's score.
        sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    else:
        # Shuffle-free: one shingle evaluation per base row, no explode.
        sizes = df.select(
            F.col(id_col).alias("doc"),
            F.size(F.array_distinct(shingles(text_col, n))).alias("sz"),
        )
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sa.sz") + F.col("sb.sz") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- MinHash + LSH ---------------------------------------------------------
#
# Signature: for permutation i, sig_i(doc) = min over shingles s of
# h_i(s) where h_i(s) = xxhash64(s, seed=i). Banding: group the
# signature into bands of `rows_per_band` values; docs sharing any
# band's full sub-signature become candidates; candidates are verified
# with exact Jaccard so the final output has no false positives (recall
# depends on band geometry — that's the documented trade-off).

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
) -> DataFrame:
    """(id, array<long> signature).

    Explode + one partial-aggregating groupBy on the doc id: the
    shingle pipeline runs ONCE per document (inside Generate), then
    each exploded shingle contributes 32 cheap xxhash64+min updates,
    combined map-side before the doc-id shuffle. (A pure
    higher-order-function formulation with 32 sibling ``aggregate``
    expressions re-evaluates the shingle pipeline 32× per row —
    measured 7× slower. Duplicate shingles can't change a min, so no
    distinct is needed.)
    """
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(text_col, n)).alias("shingle")
    )
    return _signature_from_shingles(sh, id_col, num_perm)


def _signature_from_shingles(sh: DataFrame, id_col: str, num_perm: int) -> DataFrame:
    """Shared signature aggregation over a (doc, shingle) stream — one
    definition so the standalone API and the LSH pair path can't
    desynchronize on the hashing scheme."""
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return (
        sh.groupBy("doc")
        .agg(*mins)
        .select(
            F.col("doc").alias(id_col),
            F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("signature"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    At scale this is the workhorse: candidate generation touches only
    (band, band-signature) buckets instead of the full inverted index.
    """
    num_bands = num_perm // rows_per_band
    # One cached exploded shingle stream feeds ALL THREE phases
    # (signatures, verification join, set sizes) — the shingle
    # pipeline is the expensive part and runs exactly once.
    sh = _persist(_doc_shingles(df, id_col, text_col, n))
    sig = _signature_from_shingles(sh, id_col, num_perm)
    bands = sig.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            F.col("signature")[bi * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    ).alias("sig"),
                )
                for bi in range(num_bands)
            ])
        ).alias("bs"),
    ).select("doc", "bs.band", "bs.sig")
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # Exact-Jaccard verification restricted to the candidate docs only
    # — this is the whole point of LSH: never touch the full pair
    # space. The candidate set is tiny relative to the corpus, so it
    # broadcasts; shingles come from the cached stream.
    needed = (
        candidates.select(F.col("doc_a").alias("doc"))
        .union(candidates.select("doc_b"))
        .distinct()
    )
    sh_c = sh.join(F.broadcast(needed), "doc", "left_semi")
    sizes = sh_c.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh_c.alias("a")
    sb = sh_c.alias("b")
    common = (
        F.broadcast(candidates)
        .join(sa, F.col("doc_a") == F.col("a.doc"))
        .join(
            sb,
            (F.col("doc_b") == F.col("b.doc")) & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    return (
        common.join(F.broadcast(za), F.col("doc_a") == F.col("za.doc"))
        .join(F.broadcast(zb), F.col("doc_b") == F.col("zb.doc"))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("za.sz") + F.col("zb.sz") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash over distinct tokens: bit b is set when the sum
    of ±1 contributions (parity of an independent per-bit token hash)
    is positive.

    Shuffle-free narrow map: 64 sibling ``aggregate`` HOFs over the
    token array. The CollapseProject re-evaluation pitfall applies to
    the shared ``tokens()`` subexpression, but tokenization is a cheap
    split — measured 1.6 s at sf0.1 vs 2.9 s for the explode +
    64-column groupBy alternative (wide aggregation state costs more
    than the re-split), so the no-shuffle formulation wins here.
    """
    toks = F.array_distinct(tokens(text_col))
    fingerprint = F.lit(0).cast("long")
    for b in range(bits):
        # +1 when bit b's independent token hash is odd, else -1
        contrib = F.aggregate(
            toks,
            F.lit(0),
            # 2-arg lambda required (aggregate's merge fn); `b` is read
            # eagerly because F.aggregate converts the lambda immediately
            lambda acc, t: acc
            + F.when(F.xxhash64(t, F.lit(1000 + b)).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        fingerprint = fingerprint.bitwiseOR(
            F.when(contrib > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return df.select(F.col(id_col), fingerprint.alias("simhash"))
