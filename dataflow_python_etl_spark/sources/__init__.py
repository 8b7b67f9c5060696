"""Sources & sinks: typed CSV ingest, parquet catalog tables, streaming."""

from dataflow_python_etl_spark.sources.csv_ingest import ingest_csv, read_typed_csv
from dataflow_python_etl_spark.sources.catalog import (
    load_tables,
    overwrite_table,
    read_table,
)

__all__ = [
    "ingest_csv",
    "read_typed_csv",
    "load_tables",
    "overwrite_table",
    "read_table",
]
