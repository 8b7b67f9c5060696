"""End-to-end: ingest fixture CSVs → mart build → compensation.

Goldens are hand-computed from the fixture rows in conftest.py,
pinning the semantics SURVEY.md §2.2 calls correctness-relevant.
"""

import datetime

from dataflow_python_etl_spark.operators.compensation import (
    ASIENTO,
    ASISTENCIA,
    NO_APLICA,
    with_compensation,
)
from dataflow_python_etl_spark.operators.mart import build_mart, dedup_top1
from dataflow_python_etl_spark.schema import load_bq_schema
from dataflow_python_etl_spark.sources.csv_ingest import read_typed_csv

TODAY = datetime.date(2026, 8, 13)


def _load(spark, airline_fixtures, name):
    fx = airline_fixtures[name]
    return read_typed_csv(spark, fx["csv"], load_bq_schema(fx["schema"]))


def test_ingest_types_and_dirty_data(spark, airline_fixtures):
    pasajero = _load(spark, airline_fixtures, "pasajero")
    assert [f.dataType.simpleString() for f in pasajero.schema.fields] == [
        "string", "string", "string", "string", "bigint", "date",
    ]
    rows = {r["dni"]: r for r in pasajero.collect()}
    # '+'-prefixed phone parses after stripping the sign
    assert rows["11111111-1"]["telefono"] == 56911111111
    # slash date → typed date
    assert rows["11111111-1"]["fecha_de_nacimiento"] == datetime.date(1950, 1, 15)
    # empty birthdate → NULL
    assert rows["77777777-7"]["fecha_de_nacimiento"] is None
    # quoted field keeps its comma
    assert rows["11111111-1"]["direccion"] == "1 Analytical Way, London"


def test_dedup_keeps_min_tripulacion(spark, airline_fixtures):
    vuelo = _load(spark, airline_fixtures, "vuelo")
    dd = dedup_top1(vuelo, "cod_vuelo", "cod_tripulacion")
    rows = {r["cod_vuelo"]: r for r in dd.collect()}
    assert len(rows) == 3
    assert rows["FL100"]["cod_tripulacion"] == "0301"  # min of 0302/0301
    assert rows["FL200"]["cod_tripulacion"] == "0401"  # min of 0401/0402


def test_mart_build_semantics(spark, airline_fixtures):
    venta = _load(spark, airline_fixtures, "venta")
    pasajero = _load(spark, airline_fixtures, "pasajero")
    vuelo = _load(spark, airline_fixtures, "vuelo")
    mart = build_mart(venta, pasajero, vuelo)
    rows = {r["asiento"]: r for r in mart.collect()}

    # row count preserved: 8 facts in → 8 mart rows out (dedup before join)
    assert len(rows) == 8
    # orphan dni keeps flowing with NULL passenger columns (left join)
    assert rows["C01"]["nombre_completo"] is None
    assert rows["C01"]["monto"] == 90000.0
    # orphan cod_avion keeps flowing with NULL flight columns
    assert rows["D01"]["cod_vuelo"] is None
    # negative CANCELACION amount becomes positive
    assert rows["B02"]["monto"] == 80000.0
    # names obfuscated
    assert rows["A01"]["nombre_completo"] == "Ada L******* *****"
    # compensacion present but never populated by the mart build
    assert all(r["compensacion"] is None for r in rows.values())
    # 21 columns per schema_prod: venta 9 + pasajero 5 + vuelo 6 + compensacion
    assert len(mart.columns) == 21


def _mk_mart(spark, n_rows, births, flight="FLX"):
    """Synthetic minimal mart: n_rows rows on one flight with given births."""
    assert len(births) <= n_rows
    data = []
    for i in range(n_rows):
        b = births[i] if i < len(births) else datetime.date(1990, 1, 1)
        data.append(
            (flight, f"{i:08d}-1", b, datetime.datetime(2024, 1, 1, 10, 0, i), None)
        )
    return spark.createDataFrame(
        data, "cod_vuelo: string, dni: string, fecha_de_nacimiento: date, fecha_compra: timestamp, compensacion: string"
    )


def test_compensation_quota_and_brackets(spark):
    # 20 rows → quota = round(20/20)*3 = 3. Eligible: 2 minors + 2 seniors
    # = 4 candidates; only first 3 by (fecha_compra, dni) win.
    births = [
        datetime.date(2020, 1, 1),   # minor (age 6)
        datetime.date(2018, 1, 1),   # minor (age 8)
        datetime.date(1950, 1, 1),   # senior (age 76)
        datetime.date(1940, 1, 1),   # senior (age 86)
        None,                        # never updated
    ]
    mart = _mk_mart(spark, 20, births)
    out = with_compensation(mart, today=TODAY).collect()
    by_dni = {r["dni"]: r["compensacion"] for r in out}
    assert by_dni["00000000-1"] == ASISTENCIA
    assert by_dni["00000001-1"] == ASISTENCIA
    assert by_dni["00000002-1"] == ASIENTO
    # 4th eligible is beyond quota → no UPDATE fires → stays NULL
    assert by_dni["00000003-1"] is None
    # null birthdate → never touched
    assert by_dni["00000004-1"] is None
    # everyone else adult → NO APLICA (quota was > 0)
    assert all(
        by_dni[f"{i:08d}-1"] == NO_APLICA for i in range(5, 20)
    )


def test_compensation_zero_quota_leaves_nulls(spark):
    # 9 rows → round(9/20)=0 → quota 0 → no row is ever updated.
    mart = _mk_mart(spark, 9, [datetime.date(2020, 1, 1)])
    out = with_compensation(mart, today=TODAY).collect()
    assert all(r["compensacion"] is None for r in out)


def test_compensation_half_boundary_rounds_up(spark):
    # 10 rows → 10/20 = 0.5 → BQ CAST rounds to 1 → quota 3.
    mart = _mk_mart(spark, 10, [datetime.date(2020, 1, 1)])
    out = {r["dni"]: r["compensacion"] for r in with_compensation(mart, today=TODAY).collect()}
    assert out["00000000-1"] == ASISTENCIA
    assert sum(1 for v in out.values() if v == NO_APLICA) == 9


def test_compensation_respects_prior_grants(spark):
    # Second run: b counts existing grants; remaining = 3-3 = 0 on a
    # flight already fully granted → nothing changes.
    data = [
        ("FLY", f"{i:08d}-1", datetime.date(2020, 1, 1) if i < 4 else datetime.date(1990, 1, 1),
         datetime.datetime(2024, 1, 1, 10, 0, i),
         ASISTENCIA if i < 3 else (None if i == 3 else NO_APLICA))
        for i in range(20)
    ]
    mart = spark.createDataFrame(
        data, "cod_vuelo: string, dni: string, fecha_de_nacimiento: date, fecha_compra: timestamp, compensacion: string"
    )
    out = {r["dni"]: r["compensacion"] for r in with_compensation(mart, today=TODAY).collect()}
    assert out["00000003-1"] is None  # quota exhausted → untouched
    assert out["00000000-1"] == ASISTENCIA  # prior grants preserved


def test_apply_compensation_swaps_table(spark, tmp_path):
    from dataflow_python_etl_spark.operators.compensation import apply_compensation

    path = str(tmp_path / "schema_prod")
    _mk_mart(spark, 20, [datetime.date(2020, 1, 1)]).write.parquet(path)
    out = apply_compensation(spark, path, today=TODAY)
    vals = {r["compensacion"] for r in out.collect()}
    assert ASISTENCIA in vals and NO_APLICA in vals
