"""Vector column functions over ``array<float|double>`` embeddings.

All pure Catalyst higher-order functions (``zip_with`` /
``aggregate``) — JVM-side, no UDFs, so similarity math runs inside
whole-stage codegen and scales linearly with executors. Elements are
cast to double before multiplying so cross-engine (DuckDB oracle)
results agree to the ULP.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (deterministic summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; both inputs must already be double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
