"""End-to-end CLI: the three reference-parity pipelines chained over a
parquet warehouse, driven through the argparse surface."""

from dataflow_python_etl_spark import cli


def test_full_pipeline_chain(spark, airline_fixtures, tmp_path):
    wh = str(tmp_path / "lake")
    fx = airline_fixtures
    cli.main([
        "ingest",
        "--input", ",".join(fx[t]["csv"] for t in ("pasajero", "vuelo", "venta")),
        "--output", "pasajero,vuelo,venta",
        "--schemas", ",".join(fx[t]["schema"] for t in ("pasajero", "vuelo", "venta")),
        "--warehouse", wh,
    ])
    cli.main(["mart", "--warehouse", wh])
    cli.main(["compensation", "--warehouse", wh])

    prod = spark.read.parquet(f"{wh}/schema_prod")
    assert prod.count() == 8  # fact rows preserved end-to-end
    assert len(prod.columns) == 21
    vals = {r["compensacion"] for r in prod.select("compensacion").distinct().collect()}
    # 8 rows/flight → quota 0 everywhere → nothing assigned
    assert vals == {None}


def test_ingest_uses_bundled_schemas(spark, airline_fixtures, tmp_path):
    wh = str(tmp_path / "lake2")
    fx = airline_fixtures
    # no --schemas: resolved from packaged resources by table name
    cli.main([
        "ingest",
        "--input", fx["pasajero"]["csv"],
        "--output", "pasajero",
        "--warehouse", wh,
    ])
    df = spark.read.parquet(f"{wh}/pasajero")
    assert df.schema["telefono"].dataType.simpleString() == "bigint"
