"""BigQuery-JSON schema files → Spark ``StructType``.

The reference stores table schemas as BigQuery JSON schema files (a
flat list of ``{name, type, description}``) under ``resources/`` and
parses them with ``parse_table_schema_from_json`` (reference
``src/data_ingest.py:22-33,48,103-107``). Our engine keeps that
external-JSON contract but targets Spark types.

Type mapping (SURVEY.md §1.2): every field in the reference's schemas
omits ``mode``, which BigQuery defaults to NULLABLE — hence all fields
are nullable here too.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import types as T

# BQ legacy + standard-SQL names → Spark types. The reference only
# exercises STRING/INTEGER/FLOAT/DATE/TIMESTAMP; the rest are included
# so arbitrary BQ schema files load.
_BQ_TO_SPARK: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),  # Spark has no TimeType; keep lexical
    "DATETIME": T.TimestampNTZType(),
    "TIMESTAMP": T.TimestampType(),
    "GEOGRAPHY": T.StringType(),
    "JSON": T.StringType(),
}


def bq_field_to_spark(field: dict) -> T.StructField:
    """One BQ schema field dict → StructField (recursive for RECORD)."""
    name = field["name"]
    bq_type = field.get("type", "STRING").upper()
    mode = field.get("mode", "NULLABLE").upper()
    if bq_type in ("RECORD", "STRUCT"):
        dt: T.DataType = T.StructType(
            [bq_field_to_spark(f) for f in field.get("fields", [])]
        )
    else:
        try:
            dt = _BQ_TO_SPARK[bq_type]
        except KeyError:
            raise ValueError(f"unsupported BigQuery type {bq_type!r} for field {name!r}")
    if mode == "REPEATED":
        dt = T.ArrayType(dt, containsNull=True)
    nullable = mode != "REQUIRED"
    return T.StructField(name, dt, nullable=nullable, metadata={"description": field.get("description", "")})


def bq_schema_to_struct(fields: list[dict]) -> T.StructType:
    """A BQ JSON schema (list of field dicts) → StructType."""
    return T.StructType([bq_field_to_spark(f) for f in fields])


def load_bq_schema(path: str | Path) -> T.StructType:
    """Load a BigQuery JSON schema file (bare list, or ``{"fields": [...]}``).

    The reference wraps the bare list in ``{"fields": ...}`` before
    parsing (reference ``src/data_ingest.py:31-33``); we accept both.
    """
    data = json.loads(Path(path).read_text())
    if isinstance(data, dict):
        data = data["fields"]
    return bq_schema_to_struct(data)


def raw_string_schema(schema: T.StructType) -> T.StructType:
    """The all-STRING shadow of a schema, for permissive two-phase reads.

    CSV ingest reads everything as strings first, then applies typed
    normalization (see sources/csv_ingest.py) — mirroring how the
    reference hands raw strings to BigQuery and lets the warehouse
    coerce (SURVEY.md §1.2).
    """
    return T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    )
