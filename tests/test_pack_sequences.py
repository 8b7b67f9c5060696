"""Fixed-length training-sequence packing (corpus.pack_sequences):
contiguous GPT-style packing manifest. Cross-engine arithmetic is
q164's oracle hash; these pins cover the manifest invariants, a
hand-computed fixture, the empty-doc drop, and the distributed
prefix-sum plan (no single-partition data window)."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.corpus import pack_sequences
from dataflow_python_etl_spark.operators.dedup import unpersist_all

DDL = "doc_id long, text string"


def test_hand_computed_fixture(spark):
    """Docs of 3/5/2 real tokens (+1 EOS each) at seq_len 4:
    stream = [d1:4][d2:6][d3:3] = 13 tokens -> seqs of 4/4/4/1."""
    df = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "d e f g h"),
            (3, "i j"),
        ],
        DDL,
    )
    got = {
        r["seq_id"]: r
        for r in pack_sequences(df, seq_len=4).collect()
    }
    unpersist_all()
    assert set(got) == {0, 1, 2, 3}
    # seq 0: d1 tokens 0-3 (all 4 of d1)
    assert (got[0]["n_docs"], got[0]["n_tokens"]) == (1, 4)
    assert (got[0]["first_doc"], got[0]["last_doc"]) == (1, 1)
    # seq 1: d2 tokens 4-7 (4 of its 6)
    assert (got[1]["n_docs"], got[1]["n_tokens"]) == (1, 4)
    assert (got[1]["first_doc"], got[1]["last_doc"]) == (2, 2)
    # seq 2: d2's last 2 + d3's first 2
    assert (got[2]["n_docs"], got[2]["n_tokens"]) == (2, 4)
    assert (got[2]["first_doc"], got[2]["last_doc"]) == (2, 3)
    # seq 3: d3's final token (partial tail)
    assert (got[3]["n_docs"], got[3]["n_tokens"]) == (1, 1)


def test_manifest_invariants_on_testdata(spark):
    """Conservation + contiguity over the real documents table: total
    packed tokens == sum(real tokens + 1 EOS per kept doc); every
    sequence but the last is exactly full; doc ranges of consecutive
    sequences interlock (last_doc of seq k == first_doc of seq k+1
    when a doc crosses the boundary, or +1 adjacency otherwise)."""
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    L = 128
    rows = sorted(
        (r["seq_id"], r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in pack_sequences(docs, seq_len=L).collect()
    )
    toks = F.filter(F.split("text", r"\s+"), lambda x: F.length(x) > 0)
    want_total = (
        docs.select((F.size(toks) + 1).alias("n"))
        .where(F.col("n") >= 2)
        .agg(F.sum("n"))
        .first()[0]
    )
    unpersist_all()
    assert [r[0] for r in rows] == list(range(len(rows)))  # dense seq ids
    assert sum(r[2] for r in rows) == want_total  # token conservation
    assert all(r[2] == L for r in rows[:-1])  # all but last exactly full
    assert 0 < rows[-1][2] <= L
    for (_, _, _, _, last), (_, _, _, nxt_first, _) in zip(rows, rows[1:]):
        assert nxt_first in (last, last + 1)  # interlocking doc ranges


def test_empty_and_whitespace_docs_dropped(spark):
    """Zero-real-token docs contribute nothing — no EOS-only rows
    (no evidence, no sequence)."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "   "), (4, None), (5, "c")], DDL
    )
    got = pack_sequences(df, seq_len=100).collect()
    unpersist_all()
    # d1: 3 tokens (2+EOS), d5: 2 tokens -> one partial sequence of 5
    assert len(got) == 1
    assert got[0]["n_tokens"] == 5 and got[0]["n_docs"] == 2
    assert (got[0]["first_doc"], got[0]["last_doc"]) == (1, 5)


def test_prefix_sum_plan_is_distributed(spark):
    """The global token prefix sum must NOT plan the single-partition
    Window.orderBy wall: the data-sized window partitions by _pid
    over a RangePartitioning exchange; only the partitions-row offset
    frame may use a global-order window."""
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        pack_sequences(docs, seq_len=128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    unpersist_all()
    assert "rangepartitioning" in plan.lower()
    assert "EvalPython" not in plan


def test_bpe_mode_conservation_in_tokenizer_units(spark):
    """token_mode='bpe' (VERDICT r10 #3): the packed total equals
    sum(bpe subtokens + 1 EOS per kept doc) IN TOKENIZER UNITS, on a
    fixture where subwords genuinely diverge from whitespace words
    (case/punct/digits); whitespace mode would pack a different
    stream, pinned by direct count."""
    from dataflow_python_etl_spark.functions.text import bpe_tokens

    df = spark.createDataFrame(
        [
            (1, "The.42 quick-brown fox"),
            (2, "HTTP 200 OK; retry=false"),
            (3, ""),
            (4, "plain lower words only"),
        ],
        DDL,
    )
    want = (
        df.select(F.size(bpe_tokens("text")).alias("n"))
        .where(F.col("n") >= 1)
        .agg(F.sum(F.col("n") + 1))
        .first()[0]
    )
    ws = (
        df.select(
            F.size(
                F.filter(F.split("text", r"\s+"), lambda x: F.length(x) > 0)
            ).alias("n")
        )
        .where(F.col("n") >= 1)
        .agg(F.sum(F.col("n") + 1))
        .first()[0]
    )
    assert want != ws  # the fixture actually discriminates the modes
    got = pack_sequences(df, seq_len=8, token_mode="bpe")
    total = got.agg(F.sum("n_tokens")).first()[0]
    unpersist_all()
    assert total == want
    # seq fullness: all but the last full at 8
    rows = sorted(
        pack_sequences(df, seq_len=8, token_mode="bpe").collect(),
        key=lambda r: r["seq_id"],
    )
    unpersist_all()
    assert all(r["n_tokens"] == 8 for r in rows[:-1])
