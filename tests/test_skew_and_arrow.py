"""Skew-mitigation utilities + the Arrow-vectorized similarity tier."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.similarity import cosine_topk, cosine_topk_arrow
from dataflow_python_etl_spark.operators.skew import (
    replicate_broadcast_join,
    salted_count,
    salted_sum,
)
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_count_matches_plain(spark):
    ev = read_table(spark, SF_DIR, "events")
    plain = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    salted = {r["event_type"]: r["count"] for r in salted_count(ev, ["event_type"]).collect()}
    assert salted == plain


def test_salted_sum_matches_plain(spark):
    ev = read_table(spark, SF_DIR, "events")
    plain = {
        r["event_type"]: round(r["s"], 2)
        for r in ev.groupBy("event_type").agg(F.sum("value").alias("s")).collect()
    }
    salted = {
        r["event_type"]: round(r["sum_value"], 2)
        for r in salted_sum(ev, ["event_type"], "value").collect()
    }
    assert salted == plain


def test_replicated_join_matches_plain(spark):
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey", "left")
    salted = replicate_broadcast_join(li, orders, "l_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.select(*plain.columns).collect()}
    assert a == b


def test_arrow_cosine_matches_expression_version(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    expr = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in cosine_topk(emb, q).collect()}
    arrow = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in cosine_topk_arrow(emb, q).collect()}
    assert set(expr) == set(arrow)
    for k in expr:
        assert abs(expr[k] - arrow[k]) < 1e-9
