"""Encoding-repair (mojibake) tier — VERDICT r9 #4. The rule table is
GENERATED from the byte derivation (UTF-8 per codepoint, decoded with
sloppy CP1252), so these pins check the derivation's properties and
the Spark/composition wiring; cross-engine semantics are q162's hash."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.text import (
    MOJIBAKE_RULES,
    repair_mojibake,
)


def _sloppy_cp1252(bs: bytes) -> str:
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def _py_repair(s: str) -> str:
    for m, c in MOJIBAKE_RULES:
        s = s.replace(m, c)
    return s


COVERED = "".join(c for _, c in MOJIBAKE_RULES)


def test_table_shape_and_order():
    # full coverage: CP1252 punctuation block + Latin-1 supplement
    assert len(MOJIBAKE_RULES) == 123
    lens = [len(m) for m, _ in MOJIBAKE_RULES]
    assert lens == sorted(lens, reverse=True)  # longest gremlin first
    assert len({m for m, _ in MOJIBAKE_RULES}) == 123  # no dup gremlins


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            list("abc XY.,!?\n'\"0123456789") + list(COVERED)
        ),
        max_size=60,
    )
)
def test_repair_inverts_one_corruption_level(s):
    """For text over ASCII + the covered repertoire with NO
    pre-existing gremlin sequence: repair(sloppy_cp1252(utf8(s)))
    == s — the round-trip property the tier exists for — and the
    repaired text is a fixed point. (Text already containing a
    gremlin sequence is indistinguishable from mojibake by
    construction and is deliberately repaired — the ambiguity every
    repairer shares, documented on MOJIBAKE_RULES.)"""
    from hypothesis import assume

    assume(not any(m in s for m, _ in MOJIBAKE_RULES))
    moji = _sloppy_cp1252(s.encode("utf-8"))
    got = _py_repair(moji)
    assert got == s
    assert _py_repair(got) == got  # repaired text is a fixed point


def test_spark_expression_matches_python_reference(spark):
    fixtures = [
        "cafÃ© â€” itâ€™s â€œfineâ€\x9d â€¦ naÃ¯ve â‚¬5 Â½kg",
        "plain ascii stays put",
        "",
        "double Ã\x83Â© needs two passes, one applied here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(fixtures)], "id long, text string"
    )
    got = {
        r["id"]: r["fixed"]
        for r in df.select(
            "id", repair_mojibake("text").alias("fixed")
        ).collect()
    }
    for i, t in enumerate(fixtures):
        assert got[i] == _py_repair(t), i


def test_repair_plan_stays_jvm(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = (
        df.select(repair_mojibake("text"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "python" not in plan.lower()


def test_curate_corpus_mojibake_tier(spark):
    """Composition pin: curate_corpus(mojibake_repair=True) over a
    corrupted corpus == curate_corpus(default) over the repaired
    corpus, row for row — the tier is exactly a pre-pass."""
    import hashlib

    from dataflow_python_etl_spark.operators.corpus import curate_corpus
    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.length("text") > 0
    )
    # plant unicode then corrupt — the q162 shape
    uni = F.replace(
        F.replace(F.col("text"), F.lit("a"), F.lit("á")),
        F.lit("o"),
        F.lit("ö"),
    )
    gremlin = {c: m for m, c in MOJIBAKE_RULES}
    corrupted = docs.select(
        "doc_id",
        F.replace(
            F.replace(uni, F.lit("á"), F.lit(gremlin["á"])),
            F.lit("ö"),
            F.lit(gremlin["ö"]),
        ).alias("text"),
    )
    clean = docs.select("doc_id", uni.alias("text"))

    got = curate_corpus(corrupted, mojibake_repair=True).collect()
    unpersist_all()
    want = curate_corpus(clean).collect()
    unpersist_all()

    def digest(rows):
        h = hashlib.md5()
        for t in sorted(
            (r["doc_id"], r["text"], r["quality"], r["n_tokens"]) for r in rows
        ):
            h.update(repr(t).encode())
        return h.hexdigest()

    assert len(got) > 0
    assert digest(got) == digest(want)
