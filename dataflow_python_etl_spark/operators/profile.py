"""Table profiling: per-column statistics in ONE aggregation pass —
the ANALYZE/data-quality step a pipeline runs before trusting a new
drop of data (null explosions, cardinality collapse, range drift).

All columns' aggregates evaluate in a single groupBy-less ``agg`` (one
job, map-side partial aggregation, no shuffle beyond the final
single-row combine), then unpivot driver-side — the profile itself is
O(#columns), never O(rows). Distinct counts are HyperLogLog
(``approx_count_distinct``): exact distinct per column would be one
shuffle EACH at 100 TB; HLL folds into the same single pass at ~2%
relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def profile_agg(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """The single wide aggregate behind :func:`profile_table`, exposed
    so its plan (one scan, no extra exchanges) can be pinned in tests
    before the driver-side collect happens."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, dtype in df.dtypes:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        # Spark cannot hash MapType (anywhere in the type tree), so the
        # HLL aggregate would throw AnalysisException — count-only there
        if "map<" not in dtype:
            aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__dist"))
        # min/max are meaningless for complex types; count-only there
        if not dtype.startswith(("array", "map", "struct", "binary")):
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    return df.agg(*aggs)


def profile_table(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls,
    null_frac, n_distinct_approx, min, max).

    min/max are cast to string so heterogeneous column types fit one
    output schema (the consumer is a human or a data-quality rule,
    not arithmetic). Returns a small local DataFrame built from the
    single collected aggregate row.
    """
    spark = df.sparkSession
    row = profile_agg(df, rsd).first()
    n = row["__n"]
    out = []
    for c, dtype in df.dtypes:
        nulls = row[f"{c}__nulls"] or 0
        out.append(
            Row(
                column=c,
                dtype=dtype,
                n_rows=n,
                n_nulls=nulls,
                null_frac=round(nulls / n, 6) if n else 0.0,
                n_distinct_approx=row.asDict().get(f"{c}__dist"),
                min=row.asDict().get(f"{c}__min"),
                max=row.asDict().get(f"{c}__max"),
            )
        )
    return spark.createDataFrame(
        out,
        "column: string, dtype: string, n_rows: long, n_nulls: long, "
        "null_frac: double, n_distinct_approx: long, min: string, max: string",
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 25,
) -> DataFrame:
    """Corpus-level collocation mining: the ``top_k`` adjacent-token
    bigrams ranked by PMI lift — the association-strength profile a
    corpus report leads with (which word pairs travel together vs.
    their independent rates; boilerplate phrases and domain terms
    surface here first).

    ``lift = (c_xy / N) / ((c_x / M) * (c_y / M))`` where N is the
    corpus bigram total and M the token total — exactly ``2^PMI``, so
    the ranking is the PMI ranking. The log is deliberately NOT
    applied: lift is a chain of IEEE multiply/divide ops evaluated in
    a fixed textual order, bit-identical across engines, while libm
    ``log`` is not correctly-rounded and could flip a 6-decimal
    rounding on the hash path.

    Plan: two map-side-combined aggregations (bigram counts sharded on
    the pair, unigram counts on the word), two joins of the pair table
    against the vocabulary table (unhinted — web-scale vocabularies
    are NOT broadcastable; AQE broadcasts when actually small), and
    1-row total frames crossed in (a broadcast of one row each).
    Ordering is by the ROUNDED lift with a (w1, w2) tie-break — the
    repo's ranking invariant, so LIMIT is deterministic cross-engine.
    """
    from dataflow_python_etl_spark.functions.text import shingles, tokens

    uni = docs.select(F.explode(tokens(text_col)).alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    big = docs.select(F.explode(shingles(text_col, 2)).alias("sh"))
    bcnt = (
        big.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
        .select(
            F.split_part(F.col("sh"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("sh"), F.lit(" "), F.lit(2)).alias("w2"),
            "pair_count",
        )
    )
    # 1-row totals, crossed in as broadcasts (the q44 pattern:
    # crossJoin(broadcast(1 row)) is a map-side append of a constant)
    m_tot = ucnt.agg(F.sum("c").cast("double").alias("m_total"))
    n_tot = big.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    joined = (
        bcnt.join(ucnt.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(ucnt.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(m_tot))
        .crossJoin(F.broadcast(n_tot))
    )
    lift = F.round(
        (F.col("pair_count") * F.lit(1.0) / F.col("n_total"))
        / (
            (F.col("c1") * F.lit(1.0) / F.col("m_total"))
            * (F.col("c2") * F.lit(1.0) / F.col("m_total"))
        ),
        6,
    )
    return (
        joined.select("w1", "w2", F.col("pair_count").cast("long").alias("pair_count"), lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(top_k)
    )


RAKE_STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "is", "for", "on", "with",
    "as", "by", "at", "an", "be", "or", "it", "was", "are", "this",
)


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    k: int = 15,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al., 2010) over the corpus —
    ``(phrase, n_words, n_occur, sum_deg, sum_freq)``, top-``k`` by
    ``(sum_deg DESC, phrase)``: candidate phrases are maximal runs of
    non-stopword tokens, each word scored corpus-globally by frequency
    (its member-row count) and degree (the summed length of every
    phrase instance it appears in), a phrase by the sum over its
    words. INTEGER scoring variant: canonical RAKE ranks by
    ``Σ deg(w)/freq(w)`` — a sum of small-denominator rationals whose
    cross-engine float story is avoidable by reporting the two exact
    integer sums instead (the ratio is derivable from them; the
    round-5 float-discipline rule: prefer count/sum shapes).

    Scale shape: one doc-keyed window pass assigns run ids (token-
    sized, single exchange), word stats aggregate on the word key
    (vocabulary-sized) and broadcast back onto member rows, phrase
    instances aggregate on the phrase key. No all-pairs step anywhere;
    top-k is a TakeOrdered.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.dedup import register_cache

    toks = docs.select(
        F.col(doc_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "tok"),
    ).select(
        "doc",
        "pos",
        F.regexp_replace(F.lower(F.col("tok")), "[^a-z0-9]", "").alias("norm"),
    )
    is_break = (F.col("norm") == "") | F.col("norm").isin(*stopwords)
    w = Window.partitionBy("doc").orderBy("pos")
    runs = toks.select(
        "doc", "pos", "norm",
        F.sum(is_break.cast("int")).over(w).alias("run"),
    ).where(~is_break)
    # member rows with their phrase-instance length, cached: consumed
    # by the word-stats agg AND the phrase-instance agg
    members = register_cache(
        runs.select(
            "doc", "run", "pos", "norm",
            F.count(F.lit(1)).over(Window.partitionBy("doc", "run")).alias("plen"),
        )
    )
    word_stats = members.groupBy("norm").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    inst = (
        members.join(F.broadcast(word_stats), "norm")
        .groupBy("doc", "run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "norm"))),
                    lambda s: s["norm"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("deg").cast("long").alias("sum_deg"),
            F.sum("freq").cast("long").alias("sum_freq"),
        )
    )
    out = inst.groupBy("phrase").agg(
        F.min("n_words").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_occur"),
        F.min("sum_deg").alias("sum_deg"),
        F.min("sum_freq").alias("sum_freq"),
    )
    return out.orderBy(F.col("sum_deg").desc(), F.col("phrase")).limit(k)


def join_key_skew(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join-key skew diagnostic: the ``top_k`` heaviest keys of
    ``key_col`` with their row counts, SELF-JOIN pair volume (n² —
    the task size a shuffle join on this key would hand one
    partition), and share of the table in integer ppm. The report a
    100 TB operator reads BEFORE keying a join or groupBy on a
    column — it answers "does this key need salting / AQE skew
    handling" with numbers instead of a stuck-straggler postmortem.

    One map-side-combined count aggregate; the grand total is a
    1-row broadcast cross join (the repo's bounds-broadcast
    pattern); top-k runs as a distributed TakeOrdered on (count
    DESC, key ASC) — deterministic under ties, never a global sort
    of the key vocabulary.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    c = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = c.agg(F.sum("n_rows").cast("long").alias("__total"))
    return (
        c.crossJoin(F.broadcast(total))
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
        .select(
            "key",
            "n_rows",
            (F.col("n_rows") * F.col("n_rows")).alias("pair_volume"),
            F.expr("n_rows * 1000000 div __total").alias("share_ppm"),
        )
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 1,
    top_k: int = 40,
) -> DataFrame:
    """Market-basket association rules (Agrawal-Srikant shape):
    for every co-occurring item pair, both directed rules a→b with
    ``support_n`` (baskets containing both), ``conf_ppm``
    (support/n_a) and ``lift_ppm`` (N·support/(n_a·n_b)) in half-up
    integer ppm — the classic "customers who bought X also bought Y"
    analytics the reference's mart layer feeds.

    Scale shape: ONE groupBy collapses the fact to per-basket item
    sets behind a registered persist; the pair fan-out (Σ|basket|²,
    bounded by basket size — never an all-pairs over items), the
    per-item basket counts, and the 1-row basket total are all
    derived from that cache, so the fact is scanned and shuffled
    exactly once. Ratios are positive-operand integer divisions
    ((2a+b) div 2b = half-up), lift through DECIMAL(38,0) since
    10⁶·N·support overflows int64 at real N. Ties in the top-k are
    fully broken by (antecedent, consequent)."""
    from dataflow_python_etl_spark.operators.dedup import register_cache
    from dataflow_python_etl_spark.operators.sketches import _int_div

    if min_pair_support < 1:
        raise ValueError(f"min_pair_support must be >= 1, got {min_pair_support}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    b = baskets.select(F.col(basket_col).alias("o"), F.col(item_col).alias("p"))
    parts = register_cache(b.groupBy("o").agg(F.collect_set("p").alias("ps")))
    totals = parts.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    items = (
        parts.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("np"))
    )
    pairs = (
        parts.select(F.explode("ps").alias("a"), "ps")
        .select("a", F.explode("ps").alias("c"))
        .where(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("pn"))
        .where(F.col("pn") >= min_pair_support)
    )
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("antecedent"),
                    F.col("c").alias("consequent"),
                    F.col("pn").alias("pn"),
                ),
                F.struct(
                    F.col("c").alias("antecedent"),
                    F.col("a").alias("consequent"),
                    F.col("pn").alias("pn"),
                ),
            )
        ).alias("e")
    ).select("e.antecedent", "e.consequent", "e.pn")
    from dataflow_python_etl_spark.operators.sketches import dec38 as dec

    na = items.select(F.col("p").alias("antecedent"), F.col("np").alias("np_a"))
    nc = items.select(F.col("p").alias("consequent"), F.col("np").alias("np_c"))
    joined = (
        rules.join(na, "antecedent")
        .join(nc, "consequent")
        .crossJoin(F.broadcast(totals))
    )
    out = joined.select(
        "antecedent",
        "consequent",
        F.col("pn").alias("support_n"),
        _int_div(
            F.lit(2_000_000).cast("long") * F.col("pn") + F.col("np_a"),
            F.lit(2).cast("long") * F.col("np_a"),
        ).alias("conf_ppm"),
        _int_div(
            dec(F.lit(2_000_000)) * dec(F.col("n_baskets")) * dec(F.col("pn"))
            + dec(F.col("np_a")) * dec(F.col("np_c")),
            dec(F.lit(2)) * dec(F.col("np_a")) * dec(F.col("np_c")),
        ).alias("lift_ppm"),
    )
    return out.orderBy(
        F.col("support_n").desc(),
        F.col("lift_ppm").desc(),
        F.col("conf_ppm").desc(),
        "antecedent",
        "consequent",
    ).limit(top_k)
