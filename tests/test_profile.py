"""Single-pass table profiling."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.profile import profile_agg, profile_table
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_profile_small_table(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, None, 2.5), (4, "b", None)],
        "id: long, name: string, v: double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "name", "v"}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_nulls"] == 0
    assert prof["name"]["n_nulls"] == 1 and prof["name"]["null_frac"] == 0.25
    assert prof["v"]["n_nulls"] == 2
    assert prof["id"]["min"] == "1" and prof["id"]["max"] == "4"
    assert prof["name"]["n_distinct_approx"] == 2  # exact at tiny cardinality
    assert prof["v"]["min"] == "1.5" and prof["v"]["max"] == "2.5"


def test_profile_events_single_job(spark):
    events = read_table(spark, SF_DIR, "events")
    prof = profile_table(events)
    rows = {r["column"]: r for r in prof.collect()}
    assert rows["event_id"]["n_nulls"] == 0
    n = events.count()
    assert all(r["n_rows"] == n for r in rows.values())
    # HLL within its error bound vs exact on a real column
    exact = events.select(F.countDistinct("user_id")).first()[0]
    approx = rows["user_id"]["n_distinct_approx"]
    assert abs(approx - exact) / exact < 0.1
    # single aggregation: PROFILE's OWN aggregate (not a stand-in)
    # scans events exactly once and adds no exchange beyond the final
    # single-row combine
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str

    agg = profile_agg(events)
    s = explain_str(agg, "simple")
    assert s.count("Scan parquet") == 1, s
    assert count_exchanges(agg) == 1, s  # only the partial→final combine


def test_profile_map_column(spark):
    # MapType can't be hashed by Spark → HLL must be skipped, not throw
    df = spark.createDataFrame(
        [(1, {"a": "x"}), (2, {"b": "y"}), (3, None)],
        "id: long, props: map<string,string>",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["props"]["n_nulls"] == 1
    assert prof["props"]["n_distinct_approx"] is None
    assert prof["props"]["min"] is None and prof["props"]["max"] is None
    assert prof["id"]["n_distinct_approx"] == 3


# ---------------------------------------------------------------------------
# rake_keywords (q104)
# ---------------------------------------------------------------------------


def test_rake_phrases_degrees_and_occurrences(spark):
    """Stopwords delimit phrases; degree sums phrase lengths per
    member word corpus-globally; repeated phrases count occurrences
    once per instance; punctuation is stripped before matching."""
    from dataflow_python_etl_spark.operators.profile import rake_keywords

    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox and the lazy dog."),
            (2, "A lazy dog!"),
        ],
        "doc_id long, text string",
    )
    rows = {r["phrase"]: r for r in rake_keywords(docs, k=10).collect()}
    fox = rows["quick brown fox"]
    assert (fox["n_words"], fox["n_occur"], fox["sum_deg"], fox["sum_freq"]) == (
        3, 1, 9, 3,
    )
    # 'lazy dog' occurs twice -> each word freq 2, deg 2+2=4 per word
    dog = rows["lazy dog"]
    assert (dog["n_words"], dog["n_occur"], dog["sum_deg"], dog["sum_freq"]) == (
        2, 2, 8, 4,
    )
    assert set(rows) == {"quick brown fox", "lazy dog"}


def test_association_rules_conf_lift_exact(spark):
    """Crafted baskets: {1,2},{1,2},{1,3},{2} — N=4, n1=3, n2=3, n3=1.
    Rule 1→2: conf = half-up(2/3·10⁶) = 666667, lift = 8/9 → 888889;
    rule 3→1: conf = 10⁶ exactly, lift = 4/3 → 1333333. Both
    directions emitted; duplicate lineitems collapse (collect_set)."""
    import pytest
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.operators.profile import association_rules

    rows = [(1, 1), (1, 2), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2)]
    b = spark.createDataFrame(rows, "o: long, p: long")
    got = {
        (r["antecedent"], r["consequent"]): r
    for r in association_rules(b, "o", "p").collect()}
    assert set(got) == {(1, 2), (2, 1), (1, 3), (3, 1)}
    assert got[(1, 2)]["support_n"] == 2
    assert got[(1, 2)]["conf_ppm"] == 666_667
    assert got[(1, 2)]["lift_ppm"] == 888_889
    assert got[(2, 1)]["conf_ppm"] == 666_667
    assert got[(1, 3)]["conf_ppm"] == 333_333
    assert got[(1, 3)]["lift_ppm"] == 1_333_333
    assert got[(3, 1)]["conf_ppm"] == 1_000_000
    assert got[(3, 1)]["lift_ppm"] == 1_333_333
    assert unpersist_all() >= 1  # the basket cache is registered
    with pytest.raises(ValueError, match="min_pair_support"):
        association_rules(b, "o", "p", min_pair_support=0)
    with pytest.raises(ValueError, match="top_k"):
        association_rules(b, "o", "p", top_k=0)
