"""BPE vocabulary induction: hand-verified merges, deterministic
ordering, lossless encoding, and the corpus-pass/driver-learn split."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.tokenizer import (
    END,
    apply_bpe,
    learn_bpe_merges,
    word_frequencies,
)
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_learn_merges_hand_verified():
    """{ab×3, abc×2}: chars a,b,(c),</w>. Pair counts round 1:
    (a,b)=5, (b,</w>)=3, (b,c)=2, (c,</w>)=2 → merge (a,b). Round 2:
    (ab,</w>)=3, (ab,c)=2, (c,</w>)=2 → merge (ab,</w>). Round 3:
    (ab,c)=2 ties (c,</w>)=2 → lexicographically smaller (ab,c)."""
    merges = learn_bpe_merges([("ab", 3), ("abc", 2)], n_merges=3)
    assert merges == [("a", "b"), ("ab", END), ("ab", "c")]


def test_learn_merges_min_freq_stops():
    # every word unique -> all pair freqs 1 < min_freq=2 -> no merges
    assert learn_bpe_merges([("xy", 1), ("zw", 1)], n_merges=5) == []


def test_learn_merges_deterministic_tiebreak():
    # (a,b) and (c,d) both freq 2 -> lexicographic winner first
    merges = learn_bpe_merges([("ab", 2), ("cd", 2)], n_merges=1)
    assert merges == [("a", "b")]


def test_encode_lossless_and_monotone(spark):
    """Applying merges loses nothing: concatenating a doc's subtokens
    equals its words + </w> markers; more merges never increase the
    token count."""
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(50)
    wf = word_frequencies(docs)
    merges = learn_bpe_merges(wf, n_merges=40)
    assert len(merges) > 10  # real corpus: plenty of frequent pairs

    enc = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    few = {r["doc_id"]: r for r in apply_bpe(docs, merges[:5]).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(enc) == set(raw)
    for did, text in raw.items():
        words = (text or "").split()
        # lossless: concat of subtokens == concat of word+</w>
        assert "".join(enc[did]["bpe_tokens"]) == "".join(w + END for w in words)
        # monotone: the 40-merge encoding is never longer than 5-merge
        assert enc[did]["n_bpe_tokens"] <= few[did]["n_bpe_tokens"]
        assert enc[did]["n_bpe_tokens"] == len(enc[did]["bpe_tokens"])


def test_word_frequencies_single_pass_shape(spark):
    """The corpus-sized stage is ONE aggregation (single exchange) —
    merge learning sees only the bounded (word, freq) table."""
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    wf = word_frequencies(docs)
    plan = explain_str(wf, "simple")
    assert count_exchanges(wf) == 1, plan
    assert "EvalPython" not in plan
    # exact heavy-hitters cap: top-N by freq is deterministic
    top = word_frequencies(docs, top_words=10).collect()
    assert len(top) == 10
    freqs = [r["freq"] for r in top]
    assert freqs == sorted(freqs, reverse=True)


def test_apply_bpe_unseen_word_falls_back_to_chars(spark):
    docs = spark.createDataFrame([(1, "zzqz")], "doc_id: long, text: string")
    rows = apply_bpe(docs, [("a", "b")]).collect()
    assert rows[0]["bpe_tokens"] == ["z", "z", "q", "z", END]


def test_learn_merges_validation():
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe_merges([("ab", 2)], n_merges=-1)


def test_default_word_table_is_capped(spark):
    """The DEFAULT induction path is driver-bounded: word_frequencies
    caps at DEFAULT_TOP_WORDS unless the caller explicitly opts out
    with top_words=None, and the cap reaches the physical plan."""
    import inspect

    from dataflow_python_etl_spark.operators.tokenizer import DEFAULT_TOP_WORDS
    from dataflow_python_etl_spark.plans.checks import explain_str

    assert DEFAULT_TOP_WORDS == 1_000_000
    sig = inspect.signature(word_frequencies)
    assert sig.parameters["top_words"].default == DEFAULT_TOP_WORDS

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    plan = explain_str(word_frequencies(docs), "simple")
    assert "1000000" in plan, plan  # the limit is in the executed plan
    # uncapped is explicit opt-in only
    assert "1000000" not in explain_str(
        word_frequencies(docs, top_words=None), "simple"
    )
    with pytest.raises(ValueError, match="top_words"):
        word_frequencies(docs, top_words=0)


def test_segmentation_matches_between_passes(spark):
    """apply_bpe splits on the SAME ASCII whitespace class as the
    Spark-side word_frequencies split (Java \\s+): a U+00A0-joined
    token is ONE word on both sides, not two."""
    nb = "x\u00a0y"  # NO-BREAK SPACE inside the "word"
    docs = spark.createDataFrame([(1, f"{nb} {nb}")], "doc_id: long, text: string")
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf == {nb: 2}
    # merges learned over that single word apply at encode time
    merges = learn_bpe_merges(list(wf.items()), n_merges=3, min_freq=2)
    rows = apply_bpe(docs, merges).collect()
    joined = "".join(rows[0]["bpe_tokens"])
    assert joined == nb + END + nb + END
    # with enough merges the whole word collapses to few tokens —
    # impossible if encode had split on Unicode whitespace
    assert rows[0]["n_bpe_tokens"] < 8
