"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; these helpers are for the cases AQE can't fix —
a groupBy where one key holds a double-digit percentage of all rows,
or a shuffle join against a dimension where specific keys are hot.

Pattern: add a salt in [0, n_salts) → aggregate on (key, salt) —
map-side combine now spreads the hot key over n_salts reducers —
→ aggregate the partials on key alone. Two shuffles, but the first
is balanced; for a skewed key with share s of N rows, the hottest
reducer drops from s·N to s·N/n_salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Per-row salt = hash(all columns) + row position.

    The positional component (``monotonically_increasing_id``) matters
    when the hot key's rows are byte-identical — the exact shape a
    dedup-heavy pipeline sees — where a pure content hash would give
    every duplicate the same salt and defeat the mitigation. Position
    is stable for deterministic sources (same splits → same ids), so
    task retries still produce identical rows; avoid rand(), which
    breaks on recomputation.
    """
    # Position goes in as a hash INPUT (not added after) — summing two
    # longs could overflow, which throws under ANSI mode.
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns], F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16) -> DataFrame:
    """Skew-safe ``groupBy(key).count()`` via two-phase aggregation."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*key_cols).agg(F.sum("__c").alias("count"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe ``groupBy(key).sum(value)``."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(F.sum(value_col).alias("__s"))
    return partial.groupBy(*key_cols).agg(F.sum("__s").alias(f"sum_{value_col}"))


def replicate_broadcast_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Salted shuffle join for a skewed fact⋈dim key: the fact side
    gets a random-but-deterministic salt, the dim side is replicated
    across all salts, and the join key becomes (key, salt) — the hot
    key's rows spread over n_salts partitions.

    (When the dim simply fits in memory, prefer ``F.broadcast`` — this
    is for dims too big to broadcast but small enough to replicate
    n_salts× across the shuffle.)
    """
    salted_facts = with_salt(facts, n_salts)
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(replicated_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")
