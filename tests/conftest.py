from __future__ import annotations

import json
import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from dataflow_python_etl_spark.session import get_spark

    s = get_spark(app_name="tests", extra_conf={"spark.ui.enabled": "false"})
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Airline-domain fixtures: same shape as the reference's tables (see
# FIXTURES.md), rows authored here to exercise every edge case —
# orphan FK, negative amount, duplicate flights, age brackets, null
# birthdate, 1-token and repeated-char names, '+' phone numbers.
# ---------------------------------------------------------------------------

PASAJERO_ROWS = [
    # dni | nombre_completo | correo | direccion | telefono | fecha_de_nacimiento
    '11111111-1|Ada Lovelace Byron|ada@example.com|"1 Analytical Way, London"|+56911111111|1950/01/15',
    "22222222-2|Bob Marley|bob@example.com|56 Hope Road|+56922222222|2015/06/01",
    "33333333-3|Carla Espinoza Mena|carla@example.com|Av. Siempre Viva 742|+56933333333|1990/03/09",
    "44444444-4|Dan|dan@example.com|Calle Falsa 123|+56944444444|2020/12/31",
    "55555555-5|Eve Evergreen Everest|eve@example.com|Elm Street 5|+56955555555|1940/07/04",
    "66666666-6|Fay Faye|fay@example.com|Oak Lane 9|+56966666666|1988/11/11",
    "77777777-7|Gus Gusto|gus@example.com|Pine Blvd 2|+56977777777|",
]

VUELO_ROWS = [
    # cod_avion | capacidad | cod_tripulacion | cod_piloto | cod_vuelo | salida | llegada
    "000000000201|00100|0302|0901|FL100|08:00:00|12:00:00",
    "000000000202|00120|0301|0902|FL100|08:00:00|12:00:00",  # dup cod_vuelo, lower tripulacion wins
    "000000000203|00080|0401|0903|FL200|09:00:00|13:00:00",
    "000000000203|00080|0402|0903|FL200|09:00:00|07:00:00",  # dup + llegada<salida anomaly
    "000000000204|00090|0501|0904|FL300|10:00:00|11:00:00",
]

VENTA_ROWS = [
    # codigo_aerolinea | cod_avion | asiento | dni | monto | estado | fecha_reserva | fecha_compra | categoria
    "0042|000000000202|A01|11111111-1|50000.00|VENTA|20240101 10:00:00|20240102 10:00:00|ECONOMIC",
    "0042|000000000202|A02|22222222-2|60000.00|VENTA|20240101 11:00:00|20240102 11:00:00|PREMIUM",
    "0042|000000000203|B01|33333333-3|70000.00|VENTA|20240101 12:00:00|20240102 12:00:00|VIP",
    "0042|000000000203|B02|44444444-4|-80000.00|CANCELACION|20240101 13:00:00|20240102 13:00:00|ECONOMIC",
    "0042|000000000204|C01|99999999-9|90000.00|VENTA|20240101 14:00:00|20240102 14:00:00|ECONOMIC",  # orphan dni
    "0042|000000000204|C02|55555555-5|15000.00|VENTA|20240101 15:00:00|20240102 15:00:00|ECONOMIC",
    "0042|000000000205|D01|66666666-6|25000.00|VENTA|20240101 16:00:00|20240102 16:00:00|PREMIUM",  # orphan cod_avion
    "0042|000000000202|A03|77777777-7|35000.00|VENTA|20240101 17:00:00|20240102 17:00:00|ECONOMIC",
]

PASAJERO_SCHEMA = [
    {"name": "dni", "type": "STRING"},
    {"name": "nombre_completo", "type": "STRING"},
    {"name": "correo_electronico", "type": "STRING"},
    {"name": "direccion", "type": "STRING"},
    {"name": "telefono", "type": "INTEGER"},
    {"name": "fecha_de_nacimiento", "type": "DATE"},
]

VUELO_SCHEMA = [
    {"name": "cod_avion", "type": "STRING"},
    {"name": "capacidad", "type": "STRING"},
    {"name": "cod_tripulacion", "type": "STRING"},
    {"name": "cod_piloto", "type": "STRING"},
    {"name": "cod_vuelo", "type": "STRING"},
    {"name": "horario_salida", "type": "STRING"},
    {"name": "horario_llegada", "type": "STRING"},
]

VENTA_SCHEMA = [
    {"name": "codigo_aerolinea", "type": "STRING"},
    {"name": "cod_avion", "type": "STRING"},
    {"name": "asiento", "type": "STRING"},
    {"name": "dni", "type": "STRING"},
    {"name": "monto", "type": "FLOAT"},
    {"name": "estado", "type": "STRING"},
    {"name": "fecha_reserva", "type": "TIMESTAMP"},
    {"name": "fecha_compra", "type": "TIMESTAMP"},
    {"name": "categoria", "type": "STRING"},
]


@pytest.fixture(scope="session")
def airline_fixtures(tmp_path_factory):
    """Write fixture CSVs + BQ-JSON schema files; return their paths."""
    root = tmp_path_factory.mktemp("airline")
    paths = {}
    for name, rows, schema in [
        ("pasajero", PASAJERO_ROWS, PASAJERO_SCHEMA),
        ("vuelo", VUELO_ROWS, VUELO_SCHEMA),
        ("venta", VENTA_ROWS, VENTA_SCHEMA),
    ]:
        csv_p = root / f"{name}.csv"
        csv_p.write_text("\n".join(rows) + "\n")
        schema_p = root / f"{name}.json"
        schema_p.write_text(json.dumps(schema))
        paths[name] = {"csv": str(csv_p), "schema": str(schema_p)}
    paths["root"] = str(root)
    return paths
