"""Keyed upsert over parquet: updates replace, inserts append, the
rest is untouched; table-path variant swaps safely."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.upsert import upsert_df, upsert_table


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id: long, name: string, v: double"
    )


def test_upsert_df_semantics(spark):
    updates = spark.createDataFrame(
        [(2, "b2", 22.0), (4, "d", 40.0)], "id: long, name: string, v: double"
    )
    out = {r["id"]: (r["name"], r["v"]) for r in upsert_df(_base(spark), updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_table_swaps(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark).write.parquet(path)
    updates = spark.createDataFrame([(1, "a9", 99.0)], "id: long, name: string, v: double")
    out = upsert_table(spark, path, updates, ["id"])
    assert out.count() == 3
    assert out.where(F.col("id") == 1).first()["v"] == 99.0
    # original rows for other keys intact after the swap
    assert out.where(F.col("id") == 3).first()["name"] == "c"
