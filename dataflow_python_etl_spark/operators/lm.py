"""Character n-gram language-model perplexity scoring — the CCNet /
Gopher-style corpus-quality signal: score each document by how
"language-like" its character stream is under a model fitted on the
corpus itself (or a trusted reference corpus).

Spark-first shape, all JVM:

- **fit** (:func:`fit_char_ngram_lm`): one explode + map-side-combined
  groupBy over (lang, ngram) — the same single-shuffle shape as exact
  dedup — then add-alpha smoothing in a projection. The model IS a
  DataFrame (lang, ngram, logp); nothing corpus-sized ever reaches
  the driver. ``top_k`` optionally caps the model per language with a
  deterministic (count desc, ngram asc) cut for broadcastability at
  extreme vocab sizes.
- **score** (:func:`score_with_lm`): explode each document's n-grams,
  broadcast-join the model, aggregate mean log-prob per document —
  one shuffle (the per-doc agg, map-side combined), unseen n-grams
  hit the smoothing floor via ``coalesce``. No Python anywhere.

Deterministic and engine-portable (counts + IEEE double arithmetic),
so the whole fit+score pipeline is mirrored in the DuckDB oracle
(q58) and value-hash-verified end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Loud ceiling on the broadcast model size, in ROWS. A (lang, ngram,
# logp) row is ~50 bytes in the broadcast hashed relation, so 20M rows
# ≈ 1 GB on every executor — already generous; past it the explicit
# broadcast() hint does not "flip to shuffle", it drives the driver
# and executors toward the 8 GB broadcast hard limit / OOM. The guard
# turns that cliff into an actionable error (fit with top_k, or raise
# max_broadcast_rows deliberately).
DEFAULT_MAX_BROADCAST_ROWS = 20_000_000


def _guard_model_broadcast(model: DataFrame, max_rows: int | None) -> None:
    """Raise if the model exceeds ``max_rows`` — checked with a
    limit-bounded count so the probe job short-circuits instead of
    scanning the full table."""
    if max_rows is None:
        return
    if model.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"LM model exceeds max_broadcast_rows={max_rows}: broadcasting it "
            "would replicate >~1 GB to every executor. Refit with "
            "fit_char_ngram_lm(top_k=...) to cap the per-language vocab, or "
            "pass a higher max_broadcast_rows / None to opt in explicitly."
        )


def _ngrams(text_col: str, n: int) -> F.Column:
    """All character n-grams of the lowercased text as array<string>
    (empty for texts shorter than n).

    Built like :func:`functions.text.shingles` but on the CHARACTER
    array: split once, then (n−1) ``zip_with`` concatenations of
    progressively shifted slices — every computed array is a HOF
    INPUT, never captured inside a lambda body. The earlier
    ``transform(sequence(1, len), i -> lower(text).substr(i, n))``
    spelling captured the lowered text inside the lambda, which
    re-evaluates ``lower`` once per character position — O(len²) per
    document, the q22 bug class (docs/SCALE.md round 6; measured 6×
    on 2k-char docs even at this length). The final slice bound comes
    from the STRING length, which also drops the trailing empty
    element Spark's zero-width split leaves at end-of-string.

    The length guard matters: texts shorter than n must yield an
    EMPTY array (slice-of-0 handles it here, and the explicit branch
    keeps NULL text on the empty-array policy)."""
    t = F.lower(F.col(text_col))
    chars = F.split(t, "(?!^)")
    grams = chars
    for k in range(2, n + 1):
        shifted = F.slice(chars, k, F.greatest(F.size(chars) - (k - 1), F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda x, y: F.concat(x, y))
    return F.when(
        F.length(t) >= n,
        F.slice(grams, 1, F.greatest(F.length(t) - (n - 1), F.lit(0))),
    ).otherwise(F.array().cast("array<string>"))


def fit_and_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    alpha: float = 0.5,
    max_broadcast_rows: int | None = DEFAULT_MAX_BROADCAST_ROWS,
) -> DataFrame:
    """Fit on the corpus AND score every document in one pass over
    the n-gram stream: the (id, lang, ngram) explode is computed once
    (registered cache) and feeds both the count aggregation and the
    scoring join — separately, :func:`fit_char_ngram_lm` +
    :func:`score_with_lm` each explode the corpus (measured 7.8 s →
    5.9 s on the q58 shape at sf0.1). Use the separate functions when
    the model corpus differs from the scored corpus. The model-side
    broadcast is guarded by ``max_broadcast_rows`` exactly as in
    :func:`score_with_lm` (the count probe reads the registered
    cache, so the guard costs one cache scan, not a recompute)."""
    from dataflow_python_etl_spark.operators.dedup import register_cache

    grams = register_cache(
        docs.select(
            F.col(id_col),
            F.col(lang_col).alias("lang"),
            F.explode(_ngrams(text_col, n)).alias("ngram"),
        )
    )
    counts = register_cache(
        grams.groupBy("lang", "ngram").agg(F.count(F.lit(1)).alias("c"))
    )
    # ONE job returns both the smoothing vocab and the model row count
    # (the model has exactly one row per counts row), making the
    # broadcast guard free: a separate probe of `model` measured
    # +3 s/call on the q58 bench shape (it recomputed counts→totals)
    stats = counts.agg(
        F.count_distinct("ngram").alias("v"), F.count(F.lit(1)).alias("rows")
    ).collect()[0]
    vocab = stats["v"]
    if max_broadcast_rows is not None and stats["rows"] > max_broadcast_rows:
        raise ValueError(
            f"LM model exceeds max_broadcast_rows={max_broadcast_rows}: "
            "broadcasting it would replicate >~1 GB to every executor. Refit "
            "with fit_char_ngram_lm(top_k=...) to cap the per-language vocab, "
            "or pass a higher max_broadcast_rows / None to opt in explicitly."
        )
    totals = counts.groupBy("lang").agg(F.sum("c").alias("total"))
    model = counts.join(totals, "lang").select(
        "lang",
        "ngram",
        F.log((F.col("c") + F.lit(alpha)) / (F.col("total") + F.lit(alpha * vocab))).alias(
            "logp"
        ),
    )
    floors = totals.select(
        "lang",
        F.log(F.lit(alpha) / (F.col("total") + F.lit(alpha * vocab))).alias("floor_logp"),
    )
    scored = (
        grams.join(F.broadcast(model), ["lang", "ngram"], "left")
        .join(F.broadcast(floors), "lang")
        .select(id_col, "lang", F.coalesce(F.col("logp"), F.col("floor_logp")).alias("lp"))
    )
    return scored.groupBy(id_col, "lang").agg(F.round(F.avg("lp"), 6).alias("avg_logp"))


def fit_char_ngram_lm(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    alpha: float = 0.5,
    top_k: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit per-language add-alpha n-gram models.

    Returns ``(model, floors)``:
    - ``model``: (lang, ngram, logp) with
      ``logp = ln((count + alpha) / (total + alpha * vocab))`` where
      ``vocab`` is the corpus-wide distinct n-gram count (shared
      across languages so scores are comparable);
    - ``floors``: (lang, floor_logp) — the same formula at count 0,
      applied to n-grams unseen in that language at scoring time.

    ``top_k`` keeps only the most frequent ``top_k`` n-grams per
    language (deterministic count-desc, ngram-asc cut) — mass-bounded
    like the BPE ``top_words`` cap; dropped tail n-grams score at the
    floor, which barely moves document means.
    """
    from dataflow_python_etl_spark.operators.dedup import register_cache

    grams = docs.select(
        F.col(lang_col).alias("lang"), F.explode(_ngrams(text_col, n)).alias("ngram")
    )
    # registered cache: counts feeds the vocab action, totals, and the
    # model projection — uncached, the corpus-sized explode+groupBy
    # subtree evaluates once per consumer (the CollapseProject /
    # multi-consumer pitfall); the vocab count below fills the cache
    counts = register_cache(
        grams.groupBy("lang", "ngram").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = counts.select("ngram").distinct().count()
    totals = counts.groupBy("lang").agg(F.sum("c").alias("total"))
    if top_k is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("ngram").asc())
        counts = (
            counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= top_k)
            .drop("__rn")
        )
    model = counts.join(totals, "lang").select(
        "lang",
        "ngram",
        F.log((F.col("c") + F.lit(alpha)) / (F.col("total") + F.lit(alpha * vocab))).alias(
            "logp"
        ),
    )
    floors = totals.select(
        "lang",
        F.log(F.lit(alpha) / (F.col("total") + F.lit(alpha * vocab))).alias("floor_logp"),
    )
    return model, floors


def score_with_lm(
    docs: DataFrame,
    model: DataFrame,
    floors: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    max_broadcast_rows: int | None = DEFAULT_MAX_BROADCAST_ROWS,
) -> DataFrame:
    """(id, lang, avg_logp): mean log-probability of each document's
    character n-grams under its OWN language's model (higher = more
    language-like; gibberish and wrong-language text score low —
    threshold or rank on this as a curation gate).

    Documents with no n-grams (shorter than ``n``) are dropped —
    there is nothing to score. The model side broadcasts (bounded by
    vocab, not corpus); the only shuffle is the per-document mean,
    map-side combined. A model larger than ``max_broadcast_rows``
    fails LOUDLY before the join (see
    :data:`DEFAULT_MAX_BROADCAST_ROWS`) instead of silently pushing
    the broadcast toward its 8 GB cliff — refit with ``top_k`` or
    raise the cap deliberately.
    """
    _guard_model_broadcast(model, max_broadcast_rows)
    grams = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.explode(_ngrams(text_col, n)).alias("ngram"),
    )
    scored = (
        grams.join(F.broadcast(model), ["lang", "ngram"], "left")
        .join(F.broadcast(floors), "lang")
        .select(
            id_col,
            "lang",
            F.coalesce(F.col("logp"), F.col("floor_logp")).alias("lp"),
        )
    )
    return scored.groupBy(id_col, "lang").agg(
        F.round(F.avg("lp"), 6).alias("avg_logp")
    )


def _gram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int,
    hash_prefix: str,
    extra_cols: tuple = (),
) -> DataFrame:
    """(id[, extras], bucket) fan-out shared by the DSIR family:
    hashed unigram+bigram stream in document order. Both zip_with
    inputs are sliced to length size-1 — zip_with pads the SHORTER
    side with NULL, so zipping the full array against its shifted
    self would append one NULL bigram per doc (measured).

    Empty tokens are dropped BEFORE gram building: whitespace-only
    text splits to [''] (split pads, it doesn't skip), which would
    otherwise score against the ''-gram bucket and let an empty-ish
    doc pass a DSIR gate — contradicting the documented "no
    evidence, no ingest" contract (ADVICE r8). With the filter,
    empty/whitespace docs genuinely produce zero rows, and bigrams
    never carry a leading/trailing phantom token."""
    from dataflow_python_etl_spark.functions.text import md5_hash60, tokens

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    toks = F.filter(tokens(text_col), lambda x: F.length(x) > 0)
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_bi),
        F.slice(toks, 2, n_bi),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    ).select(
        id_col,
        *extra_cols,
        (md5_hash60(F.concat(F.lit(hash_prefix), F.col("gram"))) % buckets).alias(
            "bucket"
        ),
    )


_LONG_MAX = 9223372036854775807


def _dsir_weights(cs: DataFrame, ct: DataFrame, buckets: int) -> DataFrame:
    """``(bucket, s)`` ppm weight table from per-bucket pool counts
    ``cs = (bucket, cs)`` and target counts ``ct = (bucket, ct)`` —
    the ONE copy of the linearized DSIR weight formula (ADVICE r8:
    the dsir_scores / dsir_weight_table equivalence used to depend
    on two inline copies staying byte-identical).

    Overflow guard: ``10^6*(ct+1)*(Ts+B)`` silently wraps in Spark's
    64-bit long while the DuckDB oracle computes it in INT128, so an
    overflow would surface as a confusing cross-engine hash mismatch
    instead of the documented "fit on a bounded sample" failure. The
    filter-anchored raise_error fires exactly at the bound while the
    check itself cannot overflow: nested positive floor division
    ``(L div 10^6) div (Ts+B) == L div (10^6*(Ts+B))``, and
    ``x > n div d  <=>  x*d > n`` for positive integers, so
    ``ctm+1 > that floor  <=>  10^6*(ctm+1)*(Ts+B) > L`` exactly.
    The numerator bound also covers the denominator: ``ctm >= Tt/B``
    (max over <=B buckets >= mean), so the guard forces
    ``Ts*Tt < B*2^63/10^6`` and ``(cs+1)*(Tt+B)`` fits with room."""
    totals = cs.agg(F.sum("cs").cast("long").alias("Ts")).crossJoin(
        ct.agg(
            F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("Tt"),
            F.coalesce(F.max("ct"), F.lit(0)).cast("long").alias("ctm"),
        )
    )
    return (
        cs.join(ct, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .where(
            F.when(
                F.expr(
                    f"ctm + 1 > ({_LONG_MAX} div 1000000) div (Ts + {buckets})"
                ),
                F.raise_error(
                    F.concat(
                        F.lit("dsir weights: 1000000*(ct+1)*(Ts+B) would "),
                        F.lit("exceed the 64-bit bound (Ts="),
                        F.col("Ts").cast("string"),
                        F.lit(", max ct="),
                        F.col("ctm").cast("string"),
                        F.lit(f", B={buckets}) — fit the weight table on "),
                        F.lit("a bounded sample (the DSIR paper's own "),
                        F.lit("regime) before scoring the full pool"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .select(
            "bucket",
            F.expr(
                f"(1000000 * (coalesce(ct, 0) + 1) * (Ts + {buckets})) div "
                f"((cs + 1) * (Tt + {buckets}))"
            ).alias("s"),
        )
    )


def dsir_weight_table(
    df: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_prefix: str = "dsir-v1:",
) -> DataFrame:
    """The fitted DSIR weight table alone: ``(bucket, s)`` with the
    same exact-integer ppm weights as :func:`dsir_scores` (see there
    for the math and overflow bound). Fit once over a reference pool,
    persist with ``write_and_swap``, and apply to ANY later frame —
    including online, per micro-batch — with :func:`dsir_score_with`;
    ``dsir_score_with(df, dsir_weight_table(df, t)) ==
    dsir_scores(df, t)`` is pinned in tests."""
    base = df.select(F.col(id_col), target.alias("__t"), F.col(text_col))
    g = _gram_buckets(base, id_col, text_col, buckets, hash_prefix, ("__t",))
    cnt = g.groupBy("bucket", "__t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ct = cnt.where(F.col("__t")).select("bucket", F.col("c").alias("ct"))
    cs = cnt.groupBy("bucket").agg(F.sum("c").alias("cs"))
    return _dsir_weights(cs, ct, buckets)


def dsir_score_with(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_prefix: str = "dsir-v1:",
) -> DataFrame:
    """Score a frame against a FROZEN weight table (``(bucket, s)``
    from :func:`dsir_weight_table`): ``(id, dsir_score_ppm)``. The
    table only holds buckets that occurred in the FIT pool, so a
    bucket unseen at fit time falls back to ``coalesce(s,
    1_000_000)`` — ratio 1, the neutral element of the linearized
    score (no evidence either way; NOT the smoothing floor, which
    encodes "seen in pool, absent from target"). Docs with no tokens
    produce no rows: gate callers must decide their fate explicitly.

    Also returns ``n_grams``: the score is a length-scaled SUM (the
    q156 ranking wants that), so a fixed-threshold GATE must compare
    the per-gram MEAN — ``dsir_score_ppm >= threshold * n_grams`` is
    the exact-integer cross-multiply for it."""
    g = _gram_buckets(df, id_col, text_col, buckets, hash_prefix)
    per_doc = g.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        per_doc.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("s"), F.lit(1_000_000)))
            .cast("long")
            .alias("dsir_score_ppm"),
            F.sum("c").cast("long").alias("n_grams"),
        )
    )


def dsir_scores(
    df: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_prefix: str = "dsir-v1:",
) -> DataFrame:
    """``(id, dsir_score_ppm)`` — data-selection importance score of
    every document against a TARGET sub-distribution (Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS 2023): fit hashed-n-gram bag models on the target slice
    and on the full pool, then score each doc by how target-like its
    hashed unigram+bigram profile is. ``target`` is a boolean Column
    over ``df``'s rows (e.g. ``F.col("lang") == "en"``).

    LINEARIZED, exact-integer variant: DSIR's log importance weight
    ``Σ_f c_f·ln(p_f/q_f)`` is replaced by ``Σ_f c_f·s_f`` with
    ``s_f = (10⁶·(ct_f+1)·(Ts+B)) div ((cs_f+1)·(Tt+B))`` — the
    smoothed probability ratio in ppm (first-order expansion of the
    log; identical ranking direction, and ``ln`` is engine-private at
    the last ulp so the log form cannot be cross-engine hash-checked
    — the HLL raw-regime precedent). Everything is exact integer
    arithmetic over portable md5 bucket hashes, so the q156 oracle
    verifies the whole fit+score pipeline by value hash. Overflow
    bound: ``10⁶·(ct_max+1)·(Ts+B) < 2⁶³`` — at gram volumes beyond
    ~10⁵·ct_max, fit the weight table on a bounded sample (the DSIR
    paper's own regime) before scoring the full pool.

    Scale shape, all JVM: one explode + (id, bucket) map-side-combined
    count [the only gram-volume shuffle], two B-bounded bucket aggs
    derived from that (registered persist — three consumers), a
    broadcast join of the ≤B-row weight table, one per-doc agg. The
    fitted "model" never exists driver-side. Docs with no tokens
    (NULL/empty/whitespace-only text) produce no rows — they have no
    evidence either way and callers keep or drop them explicitly.

    Gram fan-out and weight formula both live in ONE place
    (:func:`_gram_buckets` / :func:`_dsir_weights`) shared with
    :func:`dsir_weight_table` + :func:`dsir_score_with` — the pinned
    ``dsir_score_with(df, dsir_weight_table(df, t)) ==
    dsir_scores(df, t)`` equivalence holds by construction, not by
    two copies staying byte-identical (ADVICE r8)."""
    from dataflow_python_etl_spark.operators.dedup import register_cache

    base = df.select(F.col(id_col), target.alias("__t"), F.col(text_col))
    g = _gram_buckets(base, id_col, text_col, buckets, hash_prefix, ("__t",))
    per_doc = register_cache(
        g.groupBy(id_col, "__t", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    ct = (
        per_doc.where(F.col("__t"))
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    cs = per_doc.groupBy("bucket").agg(F.sum("c").alias("cs"))
    weights = _dsir_weights(cs, ct, buckets)
    return (
        per_doc.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("s")).cast("long").alias("dsir_score_ppm"))
    )


def gram_histogram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_prefix: str = "drift-v1:",
    count_col: str = "cnt",
) -> DataFrame:
    """``(bucket, count)`` hashed-gram histogram of a corpus — the
    ≤``buckets``-row summary :func:`corpus_drift` compares and the
    frozen reference the streaming drift monitor probes per batch.
    Map-side combined; the output is summary-sized regardless of
    corpus size."""
    return (
        _gram_buckets(df, id_col, text_col, buckets, hash_prefix)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias(count_col))
    )


def corpus_drift(
    ref: DataFrame,
    cur: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    top_k: int = 20,
    hash_prefix: str = "drift-v1:",
    _bound: int = _LONG_MAX,
) -> DataFrame:
    """Distribution drift between two corpus snapshots — the
    data-quality monitor every production ingest runs (did today's
    crawl shift vocabulary/topic mix vs the reference corpus?): total
    variation distance over the hashed unigram+bigram bucket
    histogram, plus the ``top_k`` most-drifted buckets as the
    actionable report.

    Statistic: with per-bucket gram counts ``r_b`` (ref, total R) and
    ``c_b`` (cur, total C),

        TVD = ½ Σ_b |r_b/R − c_b/C|
        contrib_b = |r_b·C − c_b·R|          (exact integer)
        tvd_ppm   = (10⁶ · Σ_b contrib_b) div (2·R·C)

    — one floor division of exact integers, so the DuckDB oracle
    hashes identically (the established cross-engine float
    discipline; a chi-square or KL/PSI needs per-bucket division or
    ln, both engine-private). TVD is a real drift metric with a
    clean interpretation: the largest probability mass any event set
    gained or lost.

    Output (``top_k`` rows): ``(bucket, ref_count, cur_count,
    contrib, rank, n_ref, n_cur, tvd_ppm)`` ordered by the exact
    integer ``contrib`` (bucket id tie-break — the ranking
    discipline); the global columns repeat on every row.

    Scale shape: two map-side-combined groupBys collapse each
    snapshot to ≤``buckets`` rows BEFORE any join; the full-outer
    bucket join, the top-k window and the TVD sum all run on that
    ≤buckets-row frame (summary-sized, like the partition-offsets
    frame — never data-sized). Overflow: ``10⁶·Σcontrib ≤ 2·10⁶·R·C``
    must fit int64, bounding R·C at ~4.6e12 gram-pairs — a
    filter-anchored ``raise_error`` fires at the exact bound; at
    100 TB, monitor drift on a sampled window per snapshot (drift is
    a statistic, not an inventory — sampling is the standard
    posture, and the guard makes the requirement loud)."""
    return drift_report(
        gram_histogram(ref, id_col, text_col, buckets, hash_prefix, "ref_count"),
        gram_histogram(cur, id_col, text_col, buckets, hash_prefix, "cur_count"),
        top_k=top_k,
        _bound=_bound,
    )


def drift_report(
    ref_hist: DataFrame,
    cur_hist: DataFrame,
    top_k: int = 20,
    _bound: int = _LONG_MAX,
) -> DataFrame:
    """The histogram-vs-histogram comparison stage of
    :func:`corpus_drift` (``(bucket, ref_count)`` vs ``(bucket,
    cur_count)``) — factored out so the streaming monitor can probe a
    FROZEN reference histogram per micro-batch without re-scanning
    the reference corpus. Same output contract as ``corpus_drift``."""
    from pyspark.sql import Window

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    j = (
        ref_hist.join(cur_hist, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("ref_count", F.lit(0)).cast("long").alias("ref_count"),
            F.coalesce("cur_count", F.lit(0)).cast("long").alias("cur_count"),
        )
    )
    tot = j.agg(
        F.coalesce(F.sum("ref_count"), F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce(F.sum("cur_count"), F.lit(0)).cast("long").alias("n_cur"),
    ).where(
        F.when(
            # 1e6 * sum(contrib) <= 2e6 * n_ref * n_cur must fit int64
            F.expr(
                f"n_ref * n_cur > {_bound} div {2_000_000} "
                "and n_ref > 0 and n_cur > 0"
            ),
            F.raise_error(
                F.concat(
                    F.lit("corpus_drift TVD would exceed the 64-bit bound "),
                    F.lit("(n_ref="),
                    F.col("n_ref").cast("string"),
                    F.lit(" grams, n_cur="),
                    F.col("n_cur").cast("string"),
                    F.lit(") — drift-monitor a sampled window per snapshot"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    d = j.crossJoin(F.broadcast(tot)).withColumn(
        "contrib",
        F.abs(
            F.col("ref_count") * F.col("n_cur")
            - F.col("cur_count") * F.col("n_ref")
        ).cast("long"),
    )
    s = d.groupBy("n_ref", "n_cur").agg(
        F.sum("contrib").cast("long").alias("__sum_contrib")
    )
    # ≤buckets-row frame: the unpartitioned window is summary-sized
    w = Window.orderBy(F.col("contrib").desc(), F.col("bucket"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .join(F.broadcast(s), ["n_ref", "n_cur"])
        .select(
            "bucket",
            "ref_count",
            "cur_count",
            "contrib",
            F.col("rank").cast("long").alias("rank"),
            "n_ref",
            "n_cur",
            F.expr(
                "CASE WHEN n_ref > 0 AND n_cur > 0 THEN "
                "(1000000 * __sum_contrib) div (2 * n_ref * n_cur) END"
            ).alias("tvd_ppm"),
        )
    )


def build_drift_reference(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_prefix: str = "drift-v1:",
) -> None:
    """Freeze a reference gram histogram to ``path`` for the
    streaming drift monitor (atomic ``write_and_swap``; the histogram
    is ≤``buckets`` rows however large the corpus). An EMPTY
    reference is refused loudly — every later batch would compare
    against nothing and report NULL drift forever."""
    from dataflow_python_etl_spark.operators.upsert import write_and_swap

    hist = gram_histogram(
        docs, id_col, text_col, buckets, hash_prefix, "ref_count"
    )
    if hist.limit(1).count() == 0:
        raise ValueError(
            "drift reference corpus produced an empty histogram — "
            "refusing to freeze a reference with no evidence"
        )
    write_and_swap(hist, path)


def corpus_drift_by_group(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_prefix: str = "drift-v1:",
    _bound: int = _LONG_MAX,
) -> DataFrame:
    """WHICH slice moved — the grouped form of :func:`corpus_drift`
    (the question a drift alert actually raises): one row per
    ``group_col`` value with that group's exact-integer TVD and its
    single most-drifted bucket.

    Output: ``(group, n_ref, n_cur, tvd_ppm, top_bucket,
    top_contrib)``. A group present on only one side reports its
    counts with NULL ``tvd_ppm`` (no reference ⇒ no statistic — the
    empty-batch rule, never a silent drop). Same cross-multiplied
    integer arithmetic and per-group filter-anchored int64 guard as
    the global form; every frame after the two map-side-combined
    histogram aggs is ≤ groups×buckets rows, and the windows are
    PARTITIONED by group (no global ordering wall)."""
    from pyspark.sql import Window

    def hist(df: DataFrame, out: str) -> DataFrame:
        return (
            _gram_buckets(
                df, id_col, text_col, buckets, hash_prefix, (group_col,)
            )
            .groupBy(group_col, "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    j = (
        hist(ref, "ref_count")
        .join(hist(cur, "cur_count"), [group_col, "bucket"], "full")
        .select(
            group_col,
            "bucket",
            F.coalesce("ref_count", F.lit(0)).cast("long").alias("ref_count"),
            F.coalesce("cur_count", F.lit(0)).cast("long").alias("cur_count"),
        )
    )
    tot = j.groupBy(group_col).agg(
        F.sum("ref_count").cast("long").alias("n_ref"),
        F.sum("cur_count").cast("long").alias("n_cur"),
    ).where(
        F.when(
            F.expr(
                f"n_ref * n_cur > {_bound} div {2_000_000} "
                "and n_ref > 0 and n_cur > 0"
            ),
            F.raise_error(
                F.concat(
                    F.lit("corpus_drift_by_group TVD would exceed the "),
                    F.lit("64-bit bound for group "),
                    F.col(group_col).cast("string"),
                    F.lit(" — drift-monitor a sampled window per snapshot"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    d = j.join(F.broadcast(tot), group_col).withColumn(
        "contrib",
        F.abs(
            F.col("ref_count") * F.col("n_cur")
            - F.col("cur_count") * F.col("n_ref")
        ).cast("long"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("contrib").desc(), F.col("bucket")
    )
    return (
        d.withColumn("__rk", F.row_number().over(w))
        .groupBy(group_col, "n_ref", "n_cur")
        .agg(
            F.sum("contrib").cast("long").alias("__sum_contrib"),
            F.max(F.when(F.col("__rk") == 1, F.col("bucket"))).alias(
                "top_bucket"
            ),
            F.max(F.when(F.col("__rk") == 1, F.col("contrib")))
            .cast("long")
            .alias("top_contrib"),
        )
        .select(
            group_col,
            "n_ref",
            "n_cur",
            F.expr(
                "CASE WHEN n_ref > 0 AND n_cur > 0 THEN "
                "(1000000 * __sum_contrib) div (2 * n_ref * n_cur) END"
            ).alias("tvd_ppm"),
            "top_bucket",
            "top_contrib",
        )
    )
