"""Character n-gram LM perplexity scoring (operators/lm.py)."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.lm import (
    _ngrams,
    fit_char_ngram_lm,
    score_with_lm,
)
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_ngrams_short_text_guard(spark):
    """Spark's sequence(1, stop<1) is DESCENDING, not empty — the
    guard must yield [] for texts shorter than n, exactly n-grams
    otherwise."""
    df = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "abc"), (4, "abcd"), (5, None)],
        "id: long, text: string",
    )
    rows = {r["id"]: r["g"] for r in df.select("id", _ngrams("text", 3).alias("g")).collect()}
    assert rows[1] == [] and rows[2] == []
    assert rows[3] == ["abc"]
    assert rows[4] == ["abc", "bcd"]
    assert rows[5] == []  # null text -> otherwise-branch empty; explode drops it


def test_lm_discriminates_own_language(spark):
    """The signal works: most documents score higher under their own
    language's model than under a swapped-language model."""
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    model, floors = fit_char_ngram_lm(docs)
    own = {r["doc_id"]: r["avg_logp"] for r in score_with_lm(docs, model, floors).collect()}
    swapped = docs.withColumn(
        "lang", F.when(F.col("lang") == "en", F.lit("zh")).otherwise(F.lit("en"))
    )
    wrong = {r["doc_id"]: r["avg_logp"] for r in score_with_lm(swapped, model, floors).collect()}
    assert len(own) == docs.count()
    better = sum(1 for k in own if own[k] > wrong[k])
    assert better / len(own) > 0.6, better


def test_lm_top_k_cap_and_floor(spark):
    """top_k caps the model per language (deterministic cut); dropped
    tail grams score at the floor, so capped scores are <= uncapped
    and every score stays finite."""
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    full_model, floors = fit_char_ngram_lm(docs)
    cap_model, _ = fit_char_ngram_lm(docs, top_k=100)
    per_lang = {
        r["lang"]: r["n"]
        for r in cap_model.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= 100 for n in per_lang.values())
    full = {r["doc_id"]: r["avg_logp"] for r in score_with_lm(docs, full_model, floors).collect()}
    capped = {r["doc_id"]: r["avg_logp"] for r in score_with_lm(docs, cap_model, floors).collect()}
    assert set(full) == set(capped)
    for k in full:
        assert capped[k] <= full[k] + 1e-9  # tail grams only lose mass


def test_lm_score_plan_shape(spark):
    """Scoring is one broadcast join + one map-side-combined mean: a
    single exchange, no Python."""
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    model, floors = fit_char_ngram_lm(docs)
    # materialize the model so its own fit exchanges don't count here
    m = model.localCheckpoint(eager=True)
    f = floors.localCheckpoint(eager=True)
    out = score_with_lm(docs, m, f)
    plan = explain_str(out, "simple")
    assert count_exchanges(out) == 1, plan
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_curate_lm_gate(spark):
    """curate_corpus(lm_bottom_fraction=...) drops each language's
    lowest-logp tail before the pair phase; default None is unchanged
    (the capstone e2e covers that path)."""
    from dataflow_python_etl_spark.operators.corpus import curate_corpus
    from dataflow_python_etl_spark.operators.dedup import unpersist_all

    docs = read_table(spark, SF_DIR, "documents")
    base = {r["doc_id"] for r in curate_corpus(docs).collect()}
    unpersist_all()
    gated = {r["doc_id"] for r in curate_corpus(
        docs, lm_bottom_fraction=0.25, lang_col="lang"
    ).collect()}
    unpersist_all()
    # not necessarily a subset: LM-dropping a pair's lower-id doc can
    # let its duplicate partner survive the dedup stage — so pin the
    # magnitude, not membership (roughly the bottom quarter went)
    assert len(gated) < 0.9 * len(base)
    assert len(gated) > 0.4 * len(base)

    import pytest

    with pytest.raises(ValueError, match="lm_bottom_fraction"):
        curate_corpus(docs, lm_bottom_fraction=1.5)


def test_lm_broadcast_guard(spark):
    """A model above max_broadcast_rows fails LOUDLY before the
    broadcast join; top_k-capped models pass under the same limit;
    None opts out explicitly."""
    from dataflow_python_etl_spark.operators.lm import (
        DEFAULT_MAX_BROADCAST_ROWS,
        fit_and_score,
        fit_char_ngram_lm,
        score_with_lm,
    )

    assert DEFAULT_MAX_BROADCAST_ROWS == 20_000_000
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text").limit(80)
    model, floors = fit_char_ngram_lm(docs)
    n_model = model.count()
    assert n_model > 10

    with pytest.raises(ValueError, match="max_broadcast_rows"):
        score_with_lm(docs, model, floors, max_broadcast_rows=n_model - 1).collect()
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        fit_and_score(docs, max_broadcast_rows=5)

    # a top_k refit brings the model under the same cap (per advice in
    # the error message) and scoring proceeds
    small_model, small_floors = fit_char_ngram_lm(docs, top_k=3)
    n_small = small_model.count()
    assert n_small < n_model
    ok = score_with_lm(docs, small_model, small_floors, max_broadcast_rows=n_small)
    assert ok.count() > 0
    # explicit opt-out still works on the oversized model
    out = score_with_lm(docs, model, floors, max_broadcast_rows=None)
    assert out.count() > 0


def test_ngrams_lower_outside_lambda(spark):
    # The q22 bug class (docs/SCALE.md round 6): a computed expression
    # captured inside a HOF lambda re-evaluates per element — _ngrams
    # once re-ran lower(text) per character position (O(len²)/doc).
    # Pin: no lambda body references the input column; lower() appears
    # only as HOF input.
    import re

    from dataflow_python_etl_spark.operators.lm import _ngrams

    df = spark.createDataFrame([("AbC",)], "text string").select(
        _ngrams("text", 3).alias("g")
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for body in re.findall(r"lambdafunction\((.*?), lambda", plan):
        assert "text#" not in body, body
    assert df.collect()[0].g == ["abc"]


def test_dsir_scores_hand_computed(spark):
    """Exact-integer DSIR weights recomputed independently in Python
    (same md5 bucket hash, same smoothed-ratio floor division) on a
    tiny corpus where target and off-target vocabularies are
    disjoint: target-vocab docs must outscore off-target docs, and
    every score must match the hand computation exactly."""
    import hashlib

    from dataflow_python_etl_spark.operators.lm import dsir_scores
    from pyspark.sql import functions as F

    B = 64
    docs = [
        (1, "alpha beta alpha", True),
        (2, "alpha beta beta beta", True),
        (3, "gamma delta gamma", False),
        (4, "alpha beta gamma", False),   # mixed: should beat doc 3
        (5, "delta delta delta", False),
        (6, None, False),                 # NULL text: no output row
        (7, "solo", False),               # 1 token: unigram only
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string, is_t: boolean")
    got = {
        r["doc_id"]: r["dsir_score_ppm"]
        for r in dsir_scores(df, F.col("is_t"), buckets=B).collect()
    }

    def bucket(gram):
        return int(hashlib.md5(f"dsir-v1:{gram}".encode()).hexdigest()[:15], 16) % B

    def grams(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    from collections import Counter
    ct, cs, per = Counter(), Counter(), {}
    for i, text, is_t in docs:
        if text is None:
            continue
        c = Counter(bucket(g) for g in grams(text))
        per[i] = c
        for b, n in c.items():
            cs[b] += n
            if is_t:
                ct[b] += n
    Ts, Tt = sum(cs.values()), sum(ct.values())
    want = {
        i: sum(
            n * ((1_000_000 * (ct[b] + 1) * (Ts + B)) // ((cs[b] + 1) * (Tt + B)))
            for b, n in c.items()
        )
        for i, c in per.items()
    }
    assert got == want
    assert 6 not in got  # NULL text: no evidence, no row
    # disjoint-vocab ordering: pure-target docs > mixed > pure-off
    assert min(got[1], got[2]) > got[4] > max(got[3], got[5])
    import pytest

    with pytest.raises(ValueError, match="buckets"):
        dsir_scores(df, F.col("is_t"), buckets=1)


def test_dsir_weight_table_compose_and_unseen_fallback(spark):
    """dsir_score_with(df, dsir_weight_table(df, t)) == dsir_scores(df, t)
    (the frozen-weight path is the same computation factored), and a
    doc whose vocabulary never occurred in the FIT pool scores exactly
    n_grams * 1e6 (unseen buckets fall back to ratio 1, the neutral
    element — not the smoothing floor)."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.lm import (
        dsir_score_with,
        dsir_scores,
        dsir_weight_table,
    )

    docs = [
        (1, "alpha beta alpha gamma", True),
        (2, "alpha beta beta", True),
        (3, "gamma delta gamma epsilon", False),
        (4, "alpha delta beta gamma", False),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string, is_t: boolean")
    B = 64
    want = {
        r["doc_id"]: r["dsir_score_ppm"]
        for r in dsir_scores(df, F.col("is_t"), buckets=B).collect()
    }
    weights = dsir_weight_table(df, F.col("is_t"), buckets=B)
    got = {
        r["doc_id"]: r["dsir_score_ppm"]
        for r in dsir_score_with(df, weights, buckets=B).collect()
    }
    assert got == want and want

    # vocabulary disjoint from the fit pool: 3 tokens + 2 bigrams = 5
    # grams, every bucket unseen -> 5 * 1_000_000 exactly (up to the
    # measure-zero chance of a bucket collision with fit grams at B=64
    # -- use fresh tokens long enough to make collisions visible if
    # the fallback is wrong)
    fresh = spark.createDataFrame(
        [(9, "zulu yankee xray")], "doc_id: long, text: string"
    )
    r = dsir_score_with(fresh, weights, buckets=B).collect()
    # collisions with fit buckets CAN occur at B=64; assert the score
    # is between the all-unseen value and a generous envelope, and
    # assert exact equality when no bucket collided
    import hashlib

    def bucket(gram):
        return int(hashlib.md5(f"dsir-v1:{gram}".encode()).hexdigest()[:15], 16) % B

    fit_buckets = set()
    for _, text, _t in docs:
        t = text.split()
        for gr in t + [f"{a} {b}" for a, b in zip(t, t[1:])]:
            fit_buckets.add(bucket(gr))
    t = "zulu yankee xray".split()
    fresh_buckets = [bucket(g) for g in t + [f"{a} {b}" for a, b in zip(t, t[1:])]]
    if not (set(fresh_buckets) & fit_buckets):
        assert r[0]["dsir_score_ppm"] == 5_000_000
    # no-token docs: no score row at all. NULL text produces no gram
    # rows trivially; empty and whitespace-only text split to ['']
    # (split pads, it doesn't skip) and would score against the
    # ''-gram bucket without _gram_buckets' zero-length-token filter
    # (ADVICE r8) — all three must vanish, "no evidence, no ingest".
    empty = spark.createDataFrame(
        [(10, None), (11, ""), (12, "   \t ")], "doc_id: long, text: string"
    )
    assert dsir_score_with(empty, weights, buckets=B).count() == 0


def test_dsir_weight_overflow_guard(spark):
    """The 10^6*(ct+1)*(Ts+B) numerator silently wraps in a 64-bit
    long while the DuckDB oracle computes INT128 — the guard must
    fail LOUDLY at the documented bound instead of surfacing as a
    cross-engine hash mismatch (ADVICE r8). Driven through
    _dsir_weights directly with fabricated bucket counts so the test
    doesn't need a 10^13-gram corpus."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from dataflow_python_etl_spark.operators.lm import _dsir_weights

    # Ts = ctm = 10^13: ctm+1 far exceeds (2^63-1 div 10^6) div (Ts+B)
    cs = spark.createDataFrame([(0, 10**13)], "bucket: long, cs: long")
    ct = spark.createDataFrame([(0, 10**13)], "bucket: long, ct: long")
    with pytest.raises(SparkRuntimeException, match="64-bit bound"):
        _dsir_weights(cs, ct, 1024).collect()

    # comfortably inside the bound: same formula, no raise
    cs_ok = spark.createDataFrame(
        [(0, 100), (1, 50)], "bucket: long, cs: long"
    )
    ct_ok = spark.createDataFrame([(0, 40)], "bucket: long, ct: long")
    rows = {r["bucket"]: r["s"] for r in _dsir_weights(cs_ok, ct_ok, 64).collect()}
    Ts, Tt, B = 150, 40, 64
    assert rows == {
        0: (1_000_000 * 41 * (Ts + B)) // (101 * (Tt + B)),
        1: (1_000_000 * 1 * (Ts + B)) // (51 * (Tt + B)),
    }
