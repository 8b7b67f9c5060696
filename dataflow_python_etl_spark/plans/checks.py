"""Assertions over physical plans — the "would this survive 100 TB?"
checks, kept executable instead of aspirational.

These inspect ``df.explain`` output for the properties that matter at
scale: filters/projections reaching the parquet scan, dimension joins
broadcasting, and shuffle (Exchange) counts staying at the plan's
theoretical minimum. tests/test_plans.py pins them for the declared
query surface so a regression that silently de-optimizes a plan fails
CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain`` as a string (it prints to stdout otherwise)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan carries at least one pushed-down filter."""
    s = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", s)
    return bool(m and m.group(1).strip())


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    s = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", s)
    if not m:
        return []
    return [p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip()]


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join moves only a broadcast side (hash for equi
    joins, nested-loop for non-equi — both keep the big side local)."""
    s = explain_str(df)
    return "BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s


def final_plan_str(df: DataFrame, mode: str = "simple") -> str:
    """Execute the DataFrame's own query execution JVM-side (no rows
    cross to Python) and return the explain string — with AQE on, this
    is the *finalized* adaptive plan (``isFinalPlan=true``), i.e. the
    join strategies chosen from measured sizes rather than static
    estimates. Used to pin "AQE still broadcasts without a hint"."""
    jqe = df._jdf.queryExecution()  # type: ignore[attr-defined]
    jqe.toRdd().count()
    return df._sc._jvm.PythonSQLUtils.explainString(jqe, mode)  # type: ignore[attr-defined]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcast
    exchanges, which move only the small side)."""
    s = explain_str(df, mode="simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", s))
