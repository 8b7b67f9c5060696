"""Graph analytics over edge DataFrames: PageRank — the canonical
iterative Spark workload (Page et al., 1999) beside the pointer-
jumping connected components in ``operators/corpus.py``.

Semantics (documented precisely so a SQL oracle can unroll them):
``rank_0(v) = 1/N``; each iteration
``rank_{k+1}(v) = (1 - d)/N + d · Σ_{(u,v)∈E} rank_k(u)/outdeg(u)``.
Dangling mass is NOT redistributed (the classic simplified variant —
ranks then sum to < 1 in graphs with sinks; monotone and convergent
all the same, and every engine computes the identical recurrence).

Scale shape: the edge set is the only large table. Each iteration is
one join of edges against the (node-sized) rank table on the source
key plus one map-side-combined sum on the destination — the same
partitioning every round, so a cluster run co-locates them after the
first shuffle. The rank table never exceeds |V| rows. Literal
arithmetic keeps the textual order ``(1 - d)/N + d * contrib`` on
both engines so doubles agree bit-for-bit per operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank steps
    over the DISTINCT directed edge set. ``rank`` is rounded to 9
    places (ranks live at 1/N scale; 6 places would quantize away
    real structure at large N)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    from dataflow_python_etl_spark.operators.dedup import register_cache

    # Pay the upstream distinct once, not per round. A registered
    # persist (not localCheckpoint): blocks are reclaimed by the
    # repo-wide unpersist_all() sweep between bench/certify trials,
    # and no eager job runs at plan-construction time. Lineage
    # truncation is not needed for `e` — only the iterated `ranks`
    # chain grows, which is fine at the default 3 iterations
    # (re-checkpoint ranks on a cadence for deep runs; docs/SCALE.md).
    e = register_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).alias("cnt"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("cnt")).alias("rank")
    )
    base = (F.lit(1.0) - F.lit(damping)) / F.col("cnt")
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("d")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    base + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 9).alias("rank"))
