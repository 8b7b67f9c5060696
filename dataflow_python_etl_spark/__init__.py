"""dataflow_python_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``jeremyruizacevedo/dataflow-python-etl`` (an Apache
Beam / Dataflow / BigQuery ETL project; see SURVEY.md) as an idiomatic
Spark DataFrame engine, plus the LLM-data-pipeline operators a
100 TB-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns, streaming).

Design principles (SURVEY.md §7):
- Declarative DataFrame/SQL plans; let Catalyst optimize.
- Broadcast small dimensions; decorrelate per-row queries into window
  aggregations; never do per-row driver or network round-trips.
- JVM-side built-in functions in the hot path; Arrow-vectorized
  pandas UDFs only where built-ins can't express the semantics.
"""

from dataflow_python_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
