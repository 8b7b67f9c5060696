"""Physical-plan introspection helpers (scale discipline checks)."""

from dataflow_python_etl_spark.plans.checks import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filters",
    "read_schema_columns",
]
