"""Static data-mixing selection (corpus.select_token_budget):
per-domain greedy token-budget fill. Cross-engine arithmetic is
q165's oracle hash; these pins cover the selection rule, the
crossing-doc/oversize semantics, and the distributed grouped
prefix-sum plan."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.corpus import select_token_budget
from dataflow_python_etl_spark.operators.dedup import unpersist_all

DDL = "doc_id long, source string, text string"


def test_greedy_fill_and_crossing_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "t t t"),        # 3 tokens, cum_before 0 -> keep
            (2, "a", "t t t t"),      # 4, cum_before 3 -> keep (crosses 5)
            (3, "a", "t"),            # cum_before 7 >= 5 -> cut
            (10, "b", "t t t t t t t t"),  # 8 > budget, cum 0 -> keep
            (11, "b", "t"),           # cum_before 8 -> cut
            (20, "c", ""),            # zero tokens: excluded entirely
            (21, "c", "t t"),         # cum_before 0 -> keep
        ],
        DDL,
    )
    got = sorted(
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_before"])
        for r in select_token_budget(df, budget_tokens=5).collect()
    )
    unpersist_all()
    assert got == [
        (1, "a", 3, 0),
        (2, "a", 4, 3),
        (10, "b", 8, 0),
        (21, "c", 2, 0),
    ]


def test_budget_invariants_on_testdata(spark):
    """Per-source: cum_before strictly increases in doc order, stays
    under the budget for every selected doc, and the NEXT unselected
    doc (if any) would start at or past the budget — the manifest is
    exactly the greedy prefix."""
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    B = 600
    sel = select_token_budget(docs, budget_tokens=B).collect()
    unpersist_all()
    by_src: dict = {}
    for r in sorted(sel, key=lambda r: (r["source"], r["doc_id"])):
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src) == 20  # every source contributes
    for src, rows in by_src.items():
        assert all(r["cum_before"] < B for r in rows)
        for a, b in zip(rows, rows[1:]):
            assert b["cum_before"] == a["cum_before"] + a["n_tokens"], src
        # the prefix is maximal: adding the next doc's start would
        # land at or past the budget
        assert rows[-1]["cum_before"] + rows[-1]["n_tokens"] >= B, src


def test_bpe_mode_budgets_in_tokenizer_units(spark):
    """token_mode='bpe' (VERDICT r10 #3): n_tokens is the q38 subword
    count, so a doc with case/punct/digits costs MORE budget than its
    whitespace word count — pinned by a fixture where the two modes
    select different greedy prefixes."""
    from dataflow_python_etl_spark.functions.text import bpe_tokens

    df = spark.createDataFrame(
        [
            # "HTTP-200.OK" = 1 whitespace word but 9 bpe subtokens
            # (H,T,T,P,-,200,.,O,K — uppercase letters are single
            # marks under BPE_RE's [^a-z0-9\s] class)
            (1, "a", "HTTP-200.OK x y"),  # ws: 3, bpe: 11
            (2, "a", "t t t"),            # ws: 3, bpe: 3
            (3, "a", "t"),
        ],
        DDL,
    )
    n1 = df.where("doc_id = 1").select(F.size(bpe_tokens("text"))).first()[0]
    assert n1 == 11  # the fixture discriminates (ws count is 3)
    ws = sorted(
        r["doc_id"]
        for r in select_token_budget(df, budget_tokens=7).collect()
    )
    bpe = sorted(
        r["doc_id"]
        for r in select_token_budget(
            df, budget_tokens=7, token_mode="bpe"
        ).collect()
    )
    unpersist_all()
    # whitespace: doc1 (3) + doc2 (cum 3<7) + doc3 (cum 6<7) all fit;
    # bpe: doc1 (11) exhausts the budget — doc2 starts at 11 >= 7.
    assert ws == [1, 2, 3]
    assert bpe == [1]


def test_grouped_prefix_sum_plan_is_distributed(spark):
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        select_token_budget(docs, budget_tokens=600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    unpersist_all()
    assert "rangepartitioning" in plan.lower()
    assert "EvalPython" not in plan
