"""Corpus-level boilerplate segment removal (CCNet/RefinedWeb
line-dedup tier): operator semantics on crafted fixtures plus exact
composition through curate_corpus."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.dedup import (
    dedup_boilerplate_segments,
    unpersist_all,
)

BANNER = "accept all cookies to continue"
MENU = "home | about | contact"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _clean(spark, rows, **kw):
    out = dedup_boilerplate_segments(_docs(spark, rows), **kw).collect()
    return {r.doc_id: (r.cleaned, r.n_segments_removed) for r in out}


def test_remove_all_cuts_shared_line_everywhere(spark):
    got = _clean(
        spark,
        [
            (1, f"{BANNER}\nunique one"),
            (2, f"unique two\n{BANNER}"),
            (3, "unique three"),
        ],
    )
    assert got[1] == ("unique one", 1)
    assert got[2] == ("unique two", 1)
    assert got[3] == ("unique three", 0)


def test_keep_first_retains_lowest_id_copy(spark):
    got = _clean(
        spark,
        [
            (5, f"{BANNER}\nmiddle\n{BANNER}"),
            (2, f"{BANNER}\nfirst doc"),
            (9, f"last\n{BANNER}"),
        ],
        policy="keep_first",
    )
    # doc 2 is the keeper: every occurrence there survives
    assert got[2] == (f"{BANNER}\nfirst doc", 0)
    # both occurrences cut in doc 5, order of survivors preserved
    assert got[5] == ("middle", 2)
    assert got[9] == ("last", 1)


def test_min_docs_threshold(spark):
    rows = [(1, f"{MENU}\na"), (2, f"{MENU}\nb"), (3, "c")]
    # shared by 2 docs: survives at min_docs=3, cut at min_docs=2
    assert _clean(spark, rows, min_docs=3)[1] == (f"{MENU}\na", 0)
    assert _clean(spark, rows, min_docs=2)[1] == ("a", 1)


def test_within_doc_repeats_do_not_count(spark):
    # the repeated line lives in ONE doc only -> not boilerplate
    # (functions.text.dedup_lines covers the within-doc case)
    got = _clean(spark, [(1, "same\nsame\nsame"), (2, "other")])
    assert got[1] == ("same\nsame\nsame", 0)


def test_blank_segments_are_structure(spark):
    got = _clean(spark, [(1, f"a\n\n{BANNER}\n\nb"), (2, BANNER)])
    # blanks preserved, banner cut (a removed segment takes its
    # separator slot with it: 5 segments/4 joins -> 4 segments/3 joins)
    assert got[1] == ("a\n\n\nb", 1)
    assert got[2] == ("", 1)  # fully-boilerplate doc comes out empty


def test_untouched_text_round_trips_exactly(spark):
    text = "alpha\n\nbeta gamma\n  indented  \ndelta"
    got = _clean(spark, [(1, text), (2, "nothing shared")])
    assert got[1] == (text, 0)


def test_validation_errors(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="policy"):
        dedup_boilerplate_segments(df, policy="nope")
    with pytest.raises(ValueError, match="min_docs"):
        dedup_boilerplate_segments(df, min_docs=1)


def test_custom_segmentation_sentences(spark):
    shared = "this sentence is everywhere"
    got = _clean(
        spark,
        [(1, f"one thing. {shared}. two thing"), (2, f"{shared}. other")],
        split_pattern=r"\. ",
        joiner=". ",
    )
    assert got[1] == ("one thing. two thing", 1)
    assert got[2] == ("other", 1)


def test_curate_corpus_boilerplate_tier_composition(spark):
    """curate_corpus(boilerplate_min_docs=2) == scrub -> boilerplate ->
    drop-empties -> the untiered pipeline, exactly; emptied docs die in
    the tier, survivors' text is really rewritten."""
    import hashlib

    from dataflow_python_etl_spark.functions.text import pii_scrub, token_count
    from dataflow_python_etl_spark.operators.corpus import curate_corpus, quality_score
    from dataflow_python_etl_spark.operators.dedup import ngram_jaccard_pairs

    prose = "the quick brown fox jumps over a lazy dog and the day is long "
    rows = [
        (1, f"{BANNER}\n{prose * 3}one"),
        (2, f"{prose * 3}two\n{BANNER}\n{MENU}"),
        (3, f"{MENU}\n{prose * 3}three"),
        (4, f"{BANNER}\n{MENU}"),  # pure boilerplate -> emptied -> dropped
        (5, f"{prose * 3}five"),
    ]
    docs = _docs(spark, rows)
    got = {r["doc_id"]: r for r in curate_corpus(docs, boilerplate_min_docs=2).collect()}
    unpersist_all()

    scrub = docs.select(F.col("doc_id"), pii_scrub("text").alias("text"))
    bp = (
        dedup_boilerplate_segments(scrub, min_docs=2)
        .where(F.trim(F.col("cleaned")) != "")
        .select("doc_id", F.col("cleaned").alias("text"))
    )
    base = bp.withColumn("quality", quality_score("text")).where(F.col("quality") >= 0.3)
    jp = ngram_jaccard_pairs(base, threshold=0.5, max_shingle_df=64)
    base = base.join(
        jp.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    want = {
        r["doc_id"]: r
        for r in base.select(
            "doc_id", "text", "quality", token_count("text").cast("long").alias("n_tokens")
        ).collect()
    }
    unpersist_all()

    def digest(d):
        h = hashlib.md5()
        for k in sorted(d):
            r = d[k]
            h.update(repr((k, r["text"], r["quality"], r["n_tokens"])).encode())
        return h.hexdigest()

    assert got and digest(got) == digest(want)
    assert 4 not in got  # emptied by the tier, not surviving as ""
    assert all(BANNER not in r["text"] and MENU not in r["text"] for r in got.values())
