"""Physical-layout sinks: partition pruning and bucketed shuffle-free
joins, asserted on the actual plans."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str
from dataflow_python_etl_spark.sources.catalog import read_table
from dataflow_python_etl_spark.sources.sinks import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def test_partition_pruning(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])
    df = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    plan = explain_str(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    got = df.count()
    want = ev.where(F.col("event_type") == "purchase").count()
    assert got == want


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    # bucketed tables live in the session's spark-warehouse dir
    # (warehouse.dir is a static conf; gitignored locally)
    orders = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items")
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "li_b", "o_orderkey", n_buckets=8
    )
    joined = bucketed_join(spark, "orders_b", "li_b", "o_orderkey")
    # same bucketing on both sides → no Exchange in the join plan
    assert count_exchanges(joined) == 0, explain_str(joined, "simple")
    assert joined.count() == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS li_b")


def test_format_roundtrips(spark, tmp_path):
    from dataflow_python_etl_spark.sources.catalog import read_table_as, write_table_as

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id: long, name: string, v: double"
    )
    want = {(r["id"], r["name"], r["v"]) for r in df.collect()}
    for fmt, opts in (
        ("parquet", {}),
        ("orc", {}),
        ("json", {}),
        ("csv", {"header": "true"}),
    ):
        path = str(tmp_path / f"t_{fmt}")
        write_table_as(df, path, fmt, **opts)
        back = read_table_as(spark, path, fmt, schema=df.schema, **opts)
        assert {(r["id"], r["name"], r["v"]) for r in back.collect()} == want, fmt
        assert back.schema == df.schema, fmt
