"""Full-text relevance search over the document corpus: Okapi BM25
(Robertson et al., TREC-3 — the public formula every search engine
starts from) as a pure DataFrame plan.

Scale shape (100 TB): the corpus-sized explode is filtered to the
query's terms BEFORE any shuffle — only (doc, query-term) hits reach
the term-frequency aggregation, so shuffle volume is bounded by
|docs containing a query term| × |query|, never the token stream.
Document lengths and the (N, avgdl) scalars are one map-side-combined
aggregation each; the per-term document frequencies come from the
already-tiny tf table. Nothing is all-pairs, nothing collects.

The log in the idf follows the q58/lm.py precedent: libm ``ln`` is
within 1 ulp on both engines and every score is rounded to 6 places
before ranking (the repo's rounded-score + id tie-break invariant),
so the cross-engine hash is stable in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_search(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Top ``top_k`` documents for a bag-of-words query under BM25.

    ``score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))``
    with ``idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`` — the standard
    Okapi weighting (k1 saturates term frequency, b normalizes for
    document length). Exact-token match semantics (terms are compared
    against the whitespace tokenization verbatim — normalize upstream
    if needed).

    Returns ``(id, bm25, n_terms_matched)`` ordered by the ROUNDED
    score descending with an id tie-break, so the LIMIT is
    deterministic cross-engine.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    from dataflow_python_etl_spark.functions.text import tokens

    lens = docs.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    # (N, avgdl) in ONE single-row aggregation, crossed in as a
    # broadcast (integer sum then one division — exact on both engines)
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w").isin(*query_terms))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1)
    )
    term_score = idf * (F.col("tf") * F.lit(k1 + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(lens, id_col)
        .join(df_t, "w")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(term_score), 6).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(top_k)
