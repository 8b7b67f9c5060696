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


def test_merge_df_update_insert_delete(spark):
    from dataflow_python_etl_spark.operators.upsert import merge_df

    source = spark.createDataFrame(
        [(2, "b2", 22.0), (3, "c", -1.0), (4, "d", 40.0), (5, "e", -5.0)],
        "id: long, name: string, v: double",
    )
    out = merge_df(
        _base(spark),
        source,
        ["id"],
        when_matched_update={"name": F.col("s.name"), "v": F.col("s.v")},
        when_matched_delete_condition=F.col("s.v") < 0,
        when_not_matched_insert={
            "id": F.col("s.id"),
            "name": F.col("s.name"),
            "v": F.col("s.v"),
        },
        when_not_matched_insert_condition=F.col("s.v") >= 0,
    )
    got = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
    # 1 untouched, 2 updated, 3 deleted (matched + negative), 4 inserted,
    # 5 dropped (source-only but fails the insert condition)
    assert got == {1: ("a", 10.0), 2: ("b2", 22.0), 4: ("d", 40.0)}
    assert out.columns == ["id", "name", "v"]


def test_merge_df_conditional_update_keeps_unmatched_clause_rows(spark):
    from dataflow_python_etl_spark.operators.upsert import merge_df

    source = spark.createDataFrame(
        [(1, "a9", 5.0), (2, "b9", 99.0)], "id: long, name: string, v: double"
    )
    out = merge_df(
        _base(spark),
        source,
        ["id"],
        when_matched_update={"v": F.col("s.v")},
        # only update when the source value is larger
        when_matched_update_condition=F.col("s.v") > F.col("t.v"),
    )
    got = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
    # id=1 fails the gate -> kept; id=2 updated (v only; name keeps target)
    assert got == {1: ("a", 10.0), 2: ("b", 99.0), 3: ("c", 30.0)}


def test_merge_df_duplicate_source_keys_raise(spark):
    import pytest
    from pyspark.errors import PySparkException

    from dataflow_python_etl_spark.operators.upsert import merge_df

    source = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "id: long, name: string, v: double"
    )
    merged = merge_df(
        _base(spark), source, ["id"], when_matched_update={"v": F.col("s.v")}
    )
    with pytest.raises(PySparkException, match="multiple source rows"):
        merged.collect()


def test_merge_table_swaps(spark, tmp_path):
    from dataflow_python_etl_spark.operators.upsert import merge_table

    path = str(tmp_path / "mt")
    _base(spark).write.parquet(path)
    source = spark.createDataFrame([(3, "", 0.0)], "id: long, name: string, v: double")
    out = merge_table(
        spark, path, source, ["id"], when_matched_delete_condition=F.lit(True)
    )
    assert {r["id"] for r in out.collect()} == {1, 2}
