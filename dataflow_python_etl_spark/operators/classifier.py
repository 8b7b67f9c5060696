"""Trained quality classifier — the fastText-style hashed-linear
component every production curation stack runs (CCNet's fastText
LM-quality filter, RedPajama-v2's quality classifiers, Dolma's
fastText pipeline) and the one the heuristic tiers here (Gopher rules,
char-trigram perplexity, DSIR importance) did not cover: a
DISCRIMINATIVE linear model trained on a labeled split, not a fitted
generative ratio.

Model: a single weight per hashed feature bucket over the shared
unigram+bigram stream (``operators.lm._gram_buckets`` — one gram
kernel for the whole DSIR/classifier family) plus a bias bucket, i.e.
exactly fastText's bag-of-hashed-ngrams linear layer with embedding
dimension 1. Training: FULL-BATCH perceptron for a FIXED number of
epochs — each epoch scores every training example against the current
weights and adds ``y·c`` for every bucket of every misclassified
example (``y·margin <= 0``):

    w⁰_b = 0
    mᵉ_d = Σ_b c_{d,b} · wᵉ_b
    wᵉ⁺¹_b = wᵉ_b + Σ_{d : y_d·mᵉ_d <= 0} y_d · c_{d,b}

Why this trainer and not SGD/logistic: the updates are SUMS of exact
integers, so the fitted weights are order-independent, deterministic,
and bit-identical in any engine — the whole fit+score pipeline is
mirrorable in the DuckDB oracle as a fixed unroll (the PageRank
exact-iteration-count precedent; an SGD pass depends on row order and
a logistic loss needs exp/log, both engine-private at the last ulp —
the HLL/DSIR linearization discipline). The margin is the classifier
surface: ``margin > 0`` predicts the positive (keep) class, and the
magnitude ranks — fastText's own decision rule for its linear case.

Scale shape, all JVM: ONE gram-volume explode + (example, bucket)
map-side-combined count (cached — every epoch reuses it), then per
epoch one broadcast join of the ≤(B+1)-row weight table + one per-
example agg + one ≤B-row update agg. The weight table never exceeds
``buckets + 1`` rows and is eagerly localCheckpoint'ed per epoch, so
the plan stays flat across epochs. At 100 TB the trainer runs on a
BOUNDED labeled split (as with the DSIR weight fit — labels are the
scarce resource anyway) and the frozen table scores the full pool /
micro-batches via :func:`quality_classifier_score_with` at one
broadcast-join + one agg per pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LONG_MAX = 9223372036854775807

#: bucket id reserved for the bias feature (real buckets are >= 0)
BIAS_BUCKET = -1


def _example_counts(
    labeled: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    buckets: int,
    hash_prefix: str,
) -> DataFrame:
    """(id, y, bucket, c) per-example hashed-gram counts + one bias
    row (bucket = -1, c = 1) per example WITH at least one gram —
    an empty/whitespace doc produces no rows at all ("no evidence,
    no score", the DSIR-gate contract), so it cannot be classified
    by bias alone."""
    from dataflow_python_etl_spark.operators.lm import _gram_buckets

    base = labeled.select(
        F.col(id_col),
        F.when(F.col(label_col).cast("boolean"), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("__y"),
        F.col(text_col),
    )
    g = _gram_buckets(base, id_col, text_col, buckets, hash_prefix, ("__y",))
    per_ex = g.groupBy(id_col, "__y", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bias = (
        per_ex.select(id_col, "__y")
        .distinct()
        .select(
            id_col,
            "__y",
            F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
            F.lit(1).cast("long").alias("c"),
        )
    )
    return per_ex.unionByName(bias)


def _margins(per_ex: DataFrame, weights: DataFrame, id_col: str) -> DataFrame:
    """(id, __y, margin) against a weight table; unseen buckets score
    0 (the perceptron's natural neutral — weight never updated)."""
    return (
        per_ex.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col, "__y")
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("w"), F.lit(0)))
            .cast("long")
            .alias("margin")
        )
    )


def quality_classifier_fit(
    labeled: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    buckets: int = 1024,
    epochs: int = 4,
    hash_prefix: str = "qclf-v1:",
) -> DataFrame:
    """Train the hashed-linear quality classifier on a labeled frame
    (``label_col`` truthy = keep-quality positive class) and return
    the frozen weight table ``(bucket, w)`` — ``bucket = -1`` is the
    bias. Fixed ``epochs`` full-batch perceptron rounds (see module
    docstring for the exact update and why it is the cross-engine-
    reproducible trainer). Epoch 0 starts from zero weights, so the
    first round's update is simply ``Σ y·c`` over ALL examples — the
    class-difference vector — and later rounds correct only what that
    linear rule still misclassifies; a round with no misclassified
    examples is a no-op (the update sum is empty), so extra epochs
    are harmless (monotone no-op padding, like the k-core peel).

    Buckets never touched by an update carry no row: scoring treats
    absent buckets as weight 0, so the table stays <= buckets+1 rows
    regardless of corpus size (broadcastable by construction)."""
    from dataflow_python_etl_spark.operators.dedup import register_cache

    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    per_ex = register_cache(
        _example_counts(labeled, id_col, text_col, label_col, buckets, hash_prefix)
    )
    # epoch 1 from w=0: every margin is 0, y*0 <= 0 — all examples
    # update, so w1 is one agg (no join against an empty table)
    weights = (
        per_ex.groupBy("bucket")
        .agg(F.sum(F.col("__y") * F.col("c")).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    for _ in range(epochs - 1):
        mis = (
            _margins(per_ex, weights, id_col)
            .where(F.col("__y") * F.col("margin") <= 0)
            .select(id_col)
        )
        upd = (
            per_ex.join(mis, id_col, "left_semi")
            .groupBy("bucket")
            .agg(F.sum(F.col("__y") * F.col("c")).cast("long").alias("u"))
        )
        weights = (
            weights.join(upd, "bucket", "full")
            .select(
                F.col("bucket"),
                (F.coalesce(F.col("w"), F.lit(0)) + F.coalesce(F.col("u"), F.lit(0)))
                .cast("long")
                .alias("w"),
            )
            .localCheckpoint(eager=True)  # keep the epoch chain flat
        )
    return weights


def quality_classifier_score_with(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_prefix: str = "qclf-v1:",
) -> DataFrame:
    """Score a frame against FROZEN classifier weights:
    ``(id, margin, n_grams)`` with ``margin = w_bias + Σ c_b·w_b``
    (exact integers; ``margin > 0`` = positive/keep class). Docs with
    no tokens produce no rows — gate callers decide their fate
    explicitly, as with :func:`~.lm.dsir_score_with`.

    Overflow guard (the DSIR/core_communities discipline): the margin
    magnitude is bounded by ``n_grams·max|w|``; past int64 Spark
    silently wraps while DuckDB promotes to INT128, so the filter-
    anchored ``raise_error`` fires at the exact cross-multiplied
    bound instead (train on a bounded labeled split — max|w| grows
    with training-set gram volume, never with the scored pool)."""
    from dataflow_python_etl_spark.operators.lm import _gram_buckets

    g = _gram_buckets(df, id_col, text_col, buckets, hash_prefix)
    per_doc = g.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # ONE always-1-row summary (bias + max|w|) so an absent bias row
    # cannot empty the cross join and the guard costs one tiny agg
    summary = weights.agg(
        F.coalesce(
            F.sum(F.when(F.col("bucket") == BIAS_BUCKET, F.col("w"))), F.lit(0)
        )
        .cast("long")
        .alias("__bias"),
        F.coalesce(F.max(F.abs(F.col("w"))), F.lit(0)).cast("long").alias("wm"),
    )
    return (
        per_doc.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("w"), F.lit(0)))
            .cast("long")
            .alias("__m"),
            F.sum("c").cast("long").alias("n_grams"),
        )
        .crossJoin(F.broadcast(summary))
        .where(
            F.when(
                # n_grams+1 covers the bias term's |w_bias| <= wm too
                F.expr(f"(n_grams + 1) > {_LONG_MAX} div greatest(wm, 1)"),
                F.raise_error(
                    F.concat(
                        F.lit("quality classifier margin would exceed the "),
                        F.lit("64-bit bound (n_grams="),
                        F.col("n_grams").cast("string"),
                        F.lit(", max|w|="),
                        F.col("wm").cast("string"),
                        F.lit(") — train on a bounded labeled split "),
                        F.lit("before scoring"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .select(
            id_col,
            (F.col("__m") + F.col("__bias")).cast("long").alias("margin"),
            "n_grams",
        )
    )


def classifier_eval(
    scored: DataFrame,
    label_col: str = "label",
    margin_col: str = "margin",
    partitions: int = 32,
    _bound: int = _LONG_MAX,
) -> DataFrame:
    """Exact-integer evaluation of a scored labeled frame — the
    train→score→EVALUATE step every classifier deployment needs
    (fastText's own ``test`` verb; what decides whether q161's gate
    threshold ships). One output row:

    ``(n, n_pos, n_neg, tp, fp, tn, fn, accuracy_ppm, precision_ppm,
    recall_ppm, u2, auc_ppm)``

    - Confusion counts at the fastText decision rule ``margin > 0``;
      accuracy/precision/recall as floor-divided ppm of exact counts
      (single integer division — cross-engine exact, the established
      float discipline; zero denominators yield NULL, never a raise).
    - ROC AUC via the Mann–Whitney U statistic with the standard
      tie correction (ties count half): since margins are exact
      integers (the q161 contract), group by DISTINCT margin value,
      prefix-sum the negative counts in margin order, and
      ``U2 = Σ_m p_m · (2·cumneg_below(m) + g_m)`` — twice the U
      statistic, so ties never produce a half and everything stays
      integer. ``auc_ppm = (1_000_000·U2) div (2·n_pos·n_neg)``.

    Scale shape: the per-margin aggregate is map-side combined; the
    prefix sum over distinct margins uses the same distributed
    range-repartition machinery as ``corpus.pack_sequences`` (no
    data-sized single-task ``Window.orderBy`` wall — the only global
    window runs on the ≤``partitions``-row partition-offsets frame).
    Overflow: ``1_000_000·U2`` must fit int64, which bounds the eval
    split at ``n_pos·n_neg ≤ ~4.6e12`` pairs (≈2.1M per class) — a
    filter-anchored ``raise_error`` fires at the exact bound. Like
    training, evaluation runs on a bounded LABELED split (labels are
    the scarce resource); the guard documents the posture loudly
    instead of wrapping silently.
    """
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.dedup import register_cache

    # Optimization r12 (guide §2.3 aggregate early, §5 driver
    # overhead): the scored frame has ONE consumer — everything,
    # including the confusion counts, derives from the per-margin
    # aggregate ``per_m`` (tp = Σ p over margins > 0 etc.), so the
    # r11 cache on ``scored`` is gone and the whole scoring pipeline
    # runs exactly once into the registered ``part`` cache below.
    y = F.col(label_col).cast("boolean")
    per_m = scored.groupBy(F.col(margin_col).alias("__mg")).agg(
        F.sum(F.when(y, 1).otherwise(0)).cast("long").alias("__p"),
        F.sum(F.when(y, 0).otherwise(1)).cast("long").alias("__g"),
    )
    part = register_cache(
        per_m.repartitionByRange(partitions, F.col("__mg"))
        .sortWithinPartitions("__mg")
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftright(F.col("_mid"), 33)
    psums = part.groupBy(pid.alias("_pid")).agg(F.sum("__g").alias("_cnt"))
    tiny = Window.orderBy("_pid")  # partitions-row frame, not data-sized
    offsets = psums.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(tiny.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
    )
    w = Window.partitionBy("_pid").orderBy("_mid")
    pref = (
        part.withColumn("_pid", pid)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            "__cumneg",
            (F.col("_off") + F.sum("__g").over(w) - F.col("__g")).cast("long"),
        )
    )
    # ONE aggregate pass carries the AUC terms AND the confusion
    # counts (tp = Σ pos over margins > 0, etc. — the per-margin
    # grouping already separates the classes at each decision
    # threshold), replacing the r11 shape's second full pass over the
    # scored frame. Same exact integers in, same out.
    u = pref.agg(
        F.coalesce(
            F.sum(F.col("__p") * (2 * F.col("__cumneg") + F.col("__g"))), F.lit(0)
        )
        .cast("long")
        .alias("u2"),
        F.coalesce(F.sum("__p"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("__g"), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(F.sum(F.when(F.col("__mg") > 0, F.col("__p"))), F.lit(0))
        .cast("long")
        .alias("tp"),
        F.coalesce(F.sum(F.when(F.col("__mg") > 0, F.col("__g"))), F.lit(0))
        .cast("long")
        .alias("fp"),
        F.coalesce(F.sum(F.when(F.col("__mg") <= 0, F.col("__g"))), F.lit(0))
        .cast("long")
        .alias("tn"),
        F.coalesce(F.sum(F.when(F.col("__mg") <= 0, F.col("__p"))), F.lit(0))
        .cast("long")
        .alias("fn"),
    )
    ppm = 1_000_000
    return (
        u
        .where(
            # filter-anchored int64 guard: 1e6 * U2 <= 1e6 * 2*n_pos*n_neg
            # must fit — raise at the exact cross-multiplied bound
            F.when(
                # _bound is injectable ONLY so the guard is testable
                # without materializing 2.1M rows per class
                F.expr(
                    f"n_pos * n_neg > {_bound} div {2 * ppm} "
                    "and n_pos > 0 and n_neg > 0"
                ),
                F.raise_error(
                    F.concat(
                        F.lit("classifier_eval AUC would exceed the 64-bit "),
                        F.lit("bound (n_pos="),
                        F.col("n_pos").cast("string"),
                        F.lit(", n_neg="),
                        F.col("n_neg").cast("string"),
                        F.lit(") — evaluate on a bounded labeled split"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
        .select(
            (F.col("n_pos") + F.col("n_neg")).alias("n"),
            "n_pos",
            "n_neg",
            "tp",
            "fp",
            "tn",
            "fn",
            F.expr(
                f"CASE WHEN n_pos + n_neg > 0 "
                f"THEN ({ppm} * (tp + tn)) div (n_pos + n_neg) END"
            ).alias("accuracy_ppm"),
            F.expr(
                f"CASE WHEN tp + fp > 0 THEN ({ppm} * tp) div (tp + fp) END"
            ).alias("precision_ppm"),
            F.expr(
                f"CASE WHEN n_pos > 0 THEN ({ppm} * tp) div n_pos END"
            ).alias("recall_ppm"),
            "u2",
            F.expr(
                f"CASE WHEN n_pos > 0 AND n_neg > 0 "
                f"THEN ({ppm} * u2) div (2 * n_pos * n_neg) END"
            ).alias("auc_ppm"),
        )
    )
