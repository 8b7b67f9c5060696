"""Declared query surface: every operator from SURVEY.md §2 (reference
core + §2.3 freebies + §2.4 scale extensions) as a named query with a
Spark implementation and, where SQL-expressible, a DuckDB oracle.

Registry contract (driver's ``__spark_entry__.py``):
- ``QUERIES[name].fn(spark, sf_dir) -> DataFrame``
- ``QUERIES[name].oracle`` — ANSI SQL over the pre-registered views
  ``region nation customer supplier part orders lineitem events
  documents embeddings`` producing the same columns (names aligned,
  floats rounded identically on both sides).

Determinism rules used throughout:
- every float aggregate / score is ``round(x, k)`` on BOTH sides;
- every ranking orders by the ROUNDED score plus an id tie-break, so
  cross-engine ULP noise cannot flip ranks;
- "today" is pinned to 2026-08-13 anywhere ages/date math appear.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.core import (
    abs_amount,
    age_years,
    obfuscate_name,
    quota_expr,
)
from dataflow_python_etl_spark.functions import text as TX
from dataflow_python_etl_spark.functions.vectors import as_double_array
from dataflow_python_etl_spark.operators import dedup as DD
from dataflow_python_etl_spark.operators import similarity as SIM
from dataflow_python_etl_spark.operators.compensation import with_compensation
from dataflow_python_etl_spark.operators.mart import dedup_top1
from dataflow_python_etl_spark.sources.catalog import read_table

TODAY = datetime.date(2026, 8, 13)


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference-core operators (SURVEY.md §2.1, O8–O23) on the testdata star
# ---------------------------------------------------------------------------

@_q(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "Flagship scan→filter→agg (TPC-H Q1 shape; operators O8/O18/O19)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "q02_projection_pushdown",
    """
    SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem WHERE l_quantity >= 45
    """,
    "Column projection + filter that must reach the parquet scan (O8)",
)
def q02_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_shipdate")
    )


@_q(
    "q03_top1_per_group",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    "Window ranking + top-1-per-group dedup (O10; reference datalake_to_mart.py:170-179)",
)
def q03_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_top1(
        _t(spark, sf_dir, "orders"), "o_custkey", ["o_orderdate", "o_orderkey"]
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


@_q(
    "q04_mart_denorm",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
           o.o_custkey, o.o_orderstatus, o.o_totalprice,
           c.c_name, c.c_mktsegment
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "Fact ⋈ two dims, broadcast left joins preserving misses (O11-O13; reference datalake_to_mart.py:72-102,198-201)",
)
def q04_mart_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # No forced F.broadcast hints: orders is fact-sized and customer
    # scales with SF, so a hard hint is a guaranteed OOM at 100 TB.
    # AQE converts these joins to broadcast at runtime whenever the
    # built side is actually small — same plan at test scale, safe at
    # cluster scale (pattern documented at operators/dedup.py:299-306;
    # plan pinned AQE-broadcast at test SF in tests/test_plans.py).
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .join(cust, orders.o_custkey == cust.c_custkey, "left")
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "o_custkey", "o_orderstatus", "o_totalprice", "c_name", "c_mktsegment",
        )
    )


@_q(
    "q05_abs_amount",
    """
    SELECT event_id, round(abs(value - 245.0), 2) AS abs_centered FROM events
    """,
    "Scalar absolute value (O14; reference datalake_to_mart.py:128-131)",
)
def q05_abs_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(abs_amount(F.col("value") - 245.0), 2).alias("abs_centered")
    )


@_q(
    "q06_obfuscate_names",
    """
    SELECT p_partkey,
           CASE WHEN strpos(p_name, ' ') = 0 THEN p_name || ' '
                ELSE split_part(p_name, ' ', 1) || ' ' ||
                     regexp_replace(
                         substr(p_name, strpos(p_name, ' ') + 1),
                         '[^' || substr(substr(p_name, strpos(p_name, ' ') + 1), 1, 1) || ' ]',
                         '*', 'g')
           END AS masked
    FROM part
    """,
    "Char-level name obfuscation (O15; reference datalake_to_mart.py:133-144)",
)
def q06_obfuscate_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey", obfuscate_name("p_name").alias("masked")
    )


@_q(
    "q07_group_quota",
    """
    SELECT o_custkey, count(*) AS cnt,
           CAST(floor(count(*) / 20.0 + 0.5) AS BIGINT) * 3 AS num_tickets_pref_disp
    FROM orders GROUP BY o_custkey
    """,
    "Decorrelated count aggregation + BQ round-on-cast quota (O18/O19; reference datalake_compensation.py:98-103)",
)
def q07_group_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            quota_expr(F.count(F.lit(1))).alias("num_tickets_pref_disp"),
        )
    )


@_q(
    "q08_filter_in_case",
    """
    SELECT o_orderkey, o_orderpriority,
           CASE WHEN o_totalprice < 50000 THEN 'LOW'
                WHEN o_totalprice > 200000 THEN 'HIGH'
                ELSE 'MID' END AS bucket
    FROM orders
    WHERE o_orderstatus IN ('O', 'F') AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    "Equality/IN filters + CASE branches (O16/O17/O22)",
)
def q08_filter_in_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(F.col("o_totalprice") < 50000, "LOW")
            .when(F.col("o_totalprice") > 200000, "HIGH")
            .otherwise("MID")
            .alias("bucket"),
        )
    )


@_q(
    "q09_age_years",
    """
    SELECT o_orderkey,
           CAST(2026 - EXTRACT(year FROM o_orderdate) AS BIGINT) AS age_years
    FROM orders
    """,
    "Bare year-subtraction age (O20; reference datalake_compensation.py:92-93; today pinned 2026-08-13)",
)
def q09_age_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", age_years("o_orderdate", today=TODAY).cast("long").alias("age_years")
    )


_COMP_ELIGIBLE = (
    "(fecha_de_nacimiento IS NOT NULL AND "
    "(2026 - EXTRACT(year FROM fecha_de_nacimiento) < 14 "
    "OR 2026 - EXTRACT(year FROM fecha_de_nacimiento) > 60))"
)

@_q(
    "q10_compensation",
    f"""
    WITH mart AS (
        SELECT c_mktsegment AS cod_vuelo,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS dni,
               CASE WHEN c_custkey % 50 = 0 THEN NULL
                    ELSE DATE '1920-01-01' + CAST((c_custkey % 100) * 365 AS INTEGER)
               END AS fecha_de_nacimiento,
               to_timestamp(c_custkey) AS fecha_compra
        FROM customer
    ),
    scored AS (
        SELECT *,
               2026 - EXTRACT(year FROM fecha_de_nacimiento) AS age,
               {_COMP_ELIGIBLE} AS eligible,
               CAST(floor(count(*) OVER (PARTITION BY cod_vuelo) / 20.0 + 0.5) AS BIGINT) * 3 AS quota,
               row_number() OVER (
                   PARTITION BY cod_vuelo
                   ORDER BY CASE WHEN {_COMP_ELIGIBLE} THEN 1 ELSE 0 END DESC, fecha_compra, dni
               ) AS rk
        FROM mart
    )
    SELECT dni, cod_vuelo,
           CASE WHEN fecha_de_nacimiento IS NULL THEN NULL
                WHEN quota <= 0 THEN NULL
                WHEN eligible AND rk <= quota THEN
                     CASE WHEN age < 14 THEN 'ASISTENCIA_PREFERENCIAL'
                          ELSE 'ASIENTO_PREFERENCIAL' END
                WHEN eligible THEN NULL
                ELSE 'NO APLICA' END AS compensacion
    FROM scored
    """,
    "Full deterministic compensation recompute (O16-O23; reference datalake_compensation.py:88-142 redesigned per SURVEY.md §7.3.1)",
)
def q10_compensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    mart = cust.select(
        F.col("c_mktsegment").alias("cod_vuelo"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("dni"),
        F.when(F.col("c_custkey") % 50 == 0, F.lit(None).cast("date"))
        .otherwise(
            F.date_add(F.lit(datetime.date(1920, 1, 1)), ((F.col("c_custkey") % 100) * 365).cast("int"))
        )
        .alias("fecha_de_nacimiento"),
        F.timestamp_seconds(F.col("c_custkey")).alias("fecha_compra"),
        F.lit(None).cast("string").alias("compensacion"),
    )
    return with_compensation(mart, today=TODAY).select("dni", "cod_vuelo", "compensacion")


# ---------------------------------------------------------------------------
# §2.3 freebies the reference lacks but our engine exposes (Q11–Q18)
# ---------------------------------------------------------------------------

@_q(
    "q11_topk_orders",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "Global sort + limit (top-k) with deterministic tie-break",
)
def q11_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


@_q(
    "q12_set_ops",
    """
    SELECT 'union' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier)
    """,
    "Set ops: UNION / EXCEPT / INTERSECT (distinct), tagged per branch",
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nationkey")  # noqa: E731
    return (
        tag(c.union(s).distinct(), "union")
        .unionByName(tag(c.subtract(s), "except"))  # EXCEPT (distinct), unlike exceptAll
        .unionByName(tag(c.intersect(s), "intersect"))
    )


@_q(
    "q13_grouping_ops",
    """
    SELECT 'rollup' AS op, c_mktsegment AS k1, CAST(c_nationkey AS VARCHAR) AS k2,
           count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
    FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    UNION ALL
    SELECT 'cube' AS op, o_orderstatus AS k1, o_orderpriority AS k2,
           count(*) AS cnt, CAST(NULL AS DOUBLE) AS bal
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets' AS op, o_orderstatus AS k1, o_orderpriority AS k2,
           count(*) AS cnt, CAST(NULL AS DOUBLE) AS bal
    FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "Multi-dimensional aggregation: ROLLUP + CUBE + explicit GROUPING SETS, tagged per branch",
)
def q13_grouping_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rollup = (
        cust.rollup("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
        .select(
            F.lit("rollup").alias("op"),
            F.col("c_mktsegment").alias("k1"),
            F.col("c_nationkey").cast("string").alias("k2"),
            "cnt", "bal",
        )
    )
    cube = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("cube").alias("op"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "cnt", F.lit(None).cast("double").alias("bal"),
        )
    )
    orders.createOrReplaceTempView("orders_q13")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS op, o_orderstatus AS k1, o_orderpriority AS k2,
               count(*) AS cnt, CAST(NULL AS DOUBLE) AS bal
        FROM orders_q13
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    return rollup.unionByName(cube).unionByName(gsets)


@_q(
    "q14_semi_anti_join",
    """
    SELECT 'semi' AS op, c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "Left-semi (EXISTS) and left-anti (NOT EXISTS) joins, tagged per branch",
)
def q14_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 300000)
    semi = (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select(F.lit("semi").alias("op"), "c_custkey", "c_name")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_name")
    )
    return semi.unionByName(anti)


@_q(
    "q15_agg_profile",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS uniq_cust,
           count(*) AS cnt,
           round(stddev_samp(o_totalprice), 4) AS sd,
           round(var_samp(o_totalprice), 2) AS var_tp,
           round(corr(o_totalprice, o_custkey), 6) AS price_cust_corr,
           round(covar_samp(o_totalprice, o_custkey), 2) AS cv
    FROM orders GROUP BY o_orderpriority
    """,
    "Aggregation profile per group: distinct count + statistical aggregates "
    "(stddev/variance/correlation/covariance) in one pass",
)
def q15_agg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("uniq_cust"),
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
            F.round(F.var_samp("o_totalprice"), 2).alias("var_tp"),
            F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("price_cust_corr"),
            F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("cv"),
        )
    )


_Q16_WINDOW_SQL = """
    SELECT o_orderkey, o_custkey,
           round(lag(o_totalprice) OVER w, 2)  AS prev_total,
           round(lead(o_totalprice) OVER w, 2) AS next_total,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS near_total,
           rank()         OVER v AS rnk,
           dense_rank()   OVER v AS drnk,
           round(percent_rank() OVER v, 6) AS prnk,
           ntile(4)       OVER v AS quartile,
           round(cume_dist() OVER v, 6) AS cdist
    FROM {table}
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           v AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""

@_q(
    "q16_window_analytics",
    _Q16_WINDOW_SQL.format(table="orders"),
    "Window analytics in one pass: lag/lead, running ROWS frame, value-based "
    "RANGE frame (fractional bound, SQL surface), and the full ranking family "
    "(rank/dense_rank/percent_rank/ntile/cume_dist)",
)
def q16_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fractional RANGE boundaries aren't expressible through the pyspark
    # Window builder (long-typed API); the SQL surface is — so the whole
    # multi-window select is declared through spark.sql (same Catalyst plan).
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q16")
    return spark.sql(_Q16_WINDOW_SQL.format(table="orders_q16"))


@_q(
    "q17_string_funcs",
    """
    SELECT p_partkey,
           lower(p_name)                                   AS lname,
           upper(substr(p_name, 1, 5))                     AS pfx,
           p_brand || '-' || p_type                        AS brand_type,
           regexp_replace(p_name, '[aeiou]', '_', 'g')     AS devoweled,
           CAST(length(p_name) AS BIGINT)                  AS name_len,
           levenshtein(p_name, p_type)                     AS name_type_dist,
           levenshtein(p_brand, 'brand#00')                AS brand_dist
    FROM part
    """,
    "Scalar string functions: lower/substr/concat/regexp_replace/length "
    "+ edit-distance fuzzy matching (levenshtein)",
)
def q17_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper(F.substring("p_name", 1, 5)).alias("pfx"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.length("p_name").cast("long").alias("name_len"),
        F.levenshtein("p_name", "p_type").alias("name_type_dist"),
        F.levenshtein("p_brand", F.lit("brand#00")).alias("brand_dist"),
    )


@_q(
    "q18_scalar_funcs",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT)   AS dy,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-08-13') AS BIGINT) AS days_ago,
           CAST(date_trunc('month', o_orderdate) AS DATE)  AS month_start,
           round(sqrt(o_totalprice), 6) AS sq,
           round(ln(o_totalprice), 6) AS lg,
           round(pow(o_totalprice, 0.25), 6) AS p25,
           CAST(floor(o_totalprice) AS BIGINT) AS fl,
           CAST(ceil(o_totalprice) AS BIGINT) AS ce,
           CAST(sign(o_totalprice - 100000) AS BIGINT) AS sgn,
           CAST(CAST(o_orderkey AS BIGINT) % 7 AS BIGINT) AS m7,
           round(greatest(o_totalprice, 50000.0), 2) AS gst,
           round(least(o_totalprice, 50000.0), 2) AS lst,
           nullif(o_orderstatus, 'P') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_defaulted,
           (o_orderstatus IS NOT DISTINCT FROM 'P') AS is_p_nullsafe
    FROM orders
    """,
    "Scalar function surface in one projection: date (year/month/day/datediff/"
    "date_trunc), math (sqrt/ln/pow/floor/ceil/sign/mod/greatest/least), and "
    "NULL semantics (nullif/coalesce/null-safe equality)",
)
def q18_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("o_totalprice")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.datediff(F.lit(TODAY), F.col("o_orderdate")).cast("long").alias("days_ago"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.round(F.sqrt(t), 6).alias("sq"),
        F.round(F.log(t), 6).alias("lg"),
        F.round(F.pow(t, F.lit(0.25)), 6).alias("p25"),
        F.floor(t).cast("long").alias("fl"),
        F.ceil(t).cast("long").alias("ce"),
        F.signum(t - 100000).cast("long").alias("sgn"),
        (F.col("o_orderkey") % 7).cast("long").alias("m7"),
        F.round(F.greatest(t, F.lit(50000.0)), 2).alias("gst"),
        F.round(F.least(t, F.lit(50000.0)), 2).alias("lst"),
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_defaulted"),
        F.col("o_orderstatus").eqNullSafe("P").alias("is_p_nullsafe"),
    )


@_q(
    "q19_json_map_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(cardinality(map(['type', 'uid'],
                                [event_type, CAST(user_id AS VARCHAR)])) AS INTEGER) AS m_size,
           map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)])['type'][1] AS m_type,
           array_to_string(list_sort(map_keys(
               map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]))), ',') AS m_keys
    FROM events
    """,
    "Semi-structured columns: JSON field extraction + map construction/size/"
    "key extraction/lookup",
)
def q19_json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.size(m).alias("m_size"),
        F.element_at(m, "type").alias("m_type"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("m_keys"),
    )


@_q(
    "q20_revenue_by_nation",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    """,
    "Multi-join star query with broadcast dims (bench headline)",
)
def q20_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        # customer scales with SF — no hard hint (AQE decides; see
        # q04 comment). nation/region are bounded (25/5 rows) so the
        # explicit broadcast hint is safe at any scale.
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 extensions: text analysis / dedup / similarity / multimodal /
# windowed event analytics (BASELINE.json north star)
# ---------------------------------------------------------------------------

_STOPWORD_SQL_LIST = "[" + ", ".join(f"'{w}'" for w in TX.EN_STOPWORDS) + "]"

@_q(
    "q21_text_metrics",
    f"""
    WITH x AS (
        SELECT doc_id,
               regexp_split_to_array(text, '\\s+') AS toks,
               length(text) AS nch,
               length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS npunct
        FROM documents
    ), y AS (
        SELECT doc_id,
               len(toks) AS ntok,
               len(list_filter(toks, t -> list_contains({_STOPWORD_SQL_LIST}, t))) AS nsw,
               nch, npunct
        FROM x
    )
    SELECT doc_id,
           CAST(ntok AS BIGINT) AS n_tokens,
           CAST(nch AS BIGINT) AS n_chars_computed,
           round(
             least(ntok / 100.0, 1.0) * 0.4
             + least((nsw * 1.0 / greatest(ntok, 1)) * 5.0, 1.0) * 0.3
             + (1.0 - least((npunct * 1.0 / greatest(nch, 1)) * 10.0, 1.0)) * 0.3,
           6) AS quality,
           round(nsw * 1.0 / greatest(ntok, 1), 6) AS en_score,
           CASE WHEN nsw * 1.0 / greatest(ntok, 1) > 0.05
                THEN 'en' ELSE 'und' END AS lang_pred
    FROM y
    """,
    "Per-document text analysis in one zero-exchange projection: token/char "
    "counts, composite quality score (length / stopword ratio / punctuation "
    "ratio), and heuristic language ID via stopword-hit ratio",
)
def q21_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    score = TX.langid_en_score("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        TX.token_count("text").cast("long").alias("n_tokens"),
        TX.char_count("text").cast("long").alias("n_chars_computed"),
        TX.quality_score("text").alias("quality"),
        score.alias("en_score"),
        F.when(score > 0.05, "en").otherwise("und").alias("lang_pred"),
    )


@_q(
    "q22_fingerprint",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(sum((i * 131 + length(toks[i]) * 7 + ascii(substr(toks[i], 1, 1)))
                    * (i % 97 + 1)) % 1000000007 AS BIGINT) AS fingerprint
    FROM tok, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) u
    GROUP BY doc_id
    """,
    "Order-sensitive document fingerprint (portable integer rolling hash)",
)
def q22_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", TX.fingerprint("text").alias("fingerprint")
    )


@_q(
    "q23_exact_dedup",
    """
    SELECT min(doc_id) AS doc_id, lang, source, count(*) AS n_dups
    FROM documents GROUP BY lang, source
    """,
    "Exact dedup keeping the min-id survivor per key (deterministic dropDuplicates)",
)
def q23_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.dedup_exact(_t(spark, sf_dir, "documents"), ["lang", "source"], "doc_id")


# Shared CTE chain: exact capped 3-gram Jaccard pairs over `documents`
# (the q24 oracle body; q48 builds its recursive-CTE components oracle
# on the same pair set so both stay literally in sync).
# tok..sz: capped 3-gram shingle SETS per document — shared by the
# Jaccard pairs (q24/q48), the containment pairs (q147), and the
# recursive cluster CTE
_NGRAM_SET_CTES = """tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM tok, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) u
        WHERE len(toks) >= 3
    ),
    hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 64),
    sh AS (SELECT * FROM sh0 ANTI JOIN hot USING (shingle)),
    sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id)"""

_NGRAM_PAIR_CTES = _NGRAM_SET_CTES + """,
    co AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b,
               round(c * 1.0 / (sa.s + sb.s - c), 6) AS jaccard
        FROM co
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE c * 1.0 / (sa.s + sb.s - c) >= 0.5
    )"""


@_q(
    "q24_ngram_jaccard_pairs",
    f"""
    WITH {_NGRAM_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    "Near-dup pairs by exact 3-gram-set Jaccard (inverted-index self-join) "
    "with the hot-shingle cap ACTIVE (df > 64 shingles dropped — the "
    "quadratic-fan-out guard a crawl corpus needs; Jaccard is computed over "
    "the same capped sets on both sides)",
)
def q24_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5,
        max_shingle_df=64,
    )


def _md5h60_sql(expr: str) -> str:
    """DuckDB mirror of functions.text.md5_hash60: first 15 hex digits
    of md5 parsed base-16 (cross-engine identical md5 of UTF-8 bytes)."""
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split(substr(md5({expr}), 1, 15), ''), "
        "c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), "
        "(acc, x) -> acc * 16 + x)"
    )


def _minhash_oracle_sql(
    num_perm: int = 32,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    extra_where: str = "",
) -> str:
    """Mirror dedup.minhash_lsh_pairs bit-for-bit: same portable base
    hash, same (a_i, b_i) affine family (dedup.MINHASH_AB literals),
    same banding, same exact-Jaccard verification. ``extra_where``
    (prefixed ``AND ...``) restricts the final pair set — q54 uses it
    to mirror the incremental operator's pairs-touching-the-batch
    contract."""
    p = DD.P_MOD
    mins = ", ".join(
        f"min((bh * {a}::BIGINT + {b}::BIGINT) % {p}) AS h{i}"
        for i, (a, b) in enumerate(DD.MINHASH_AB[:num_perm])
    )
    n_bands = num_perm // rows_per_band
    band_rows = ", ".join(
        "({}, {})".format(
            bi,
            " || ',' || ".join(
                f"h{bi * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
            ),
        )
        for bi in range(n_bands)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM tok, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) u
        WHERE len(toks) >= 3
    ),
    hashed AS (
        SELECT doc_id, {_md5h60_sql('shingle')} % {p} AS bh, shingle FROM sh
    ),
    sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    bands AS (
        SELECT doc_id, band, bsig
        FROM sig, LATERAL (VALUES {band_rows}) t(band, bsig)
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
    co AS (
        SELECT c.doc_a, c.doc_b, count(*) AS cmn
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(cmn * 1.0 / (sa.s + sb.s - cmn), 6) AS jaccard
    FROM co
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE round(cmn * 1.0 / (sa.s + sb.s - cmn), 6) >= {threshold}{extra_where}
    """


@_q(
    "q25_minhash_lsh_pairs",
    _minhash_oracle_sql(),
    "MinHash(32 perms) banded LSH near-dup candidates, verified by exact "
    "Jaccard. Signatures use a portable md5-derived universal-hash family "
    "(dedup.MINHASH_AB), so the oracle reproduces buckets bit-for-bit",
)
def q25_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, num_perm=32, rows_per_band=4, threshold=0.5,
    )


def _simhash_oracle_sql(bits: int = 64) -> str:
    """Mirror dedup.simhash: same per-token portable hash, SIMHASH_AB
    affine parity family, and powers-of-two assembly (bit 63 = the
    two's-complement min value on both engines)."""
    p = DD.P_MOD
    # -2^63 can't be written as one literal (the positive half
    # overflows before negation) — standard (-(2^63-1) - 1) spelling.
    pw = lambda i: f"{1 << i}::BIGINT" if i < 63 else "(-9223372036854775807 - 1)::BIGINT"  # noqa: E731
    rows = ", ".join(
        f"({a}::BIGINT, {b}::BIGINT, {pw(i)})"
        for i, (a, b) in enumerate(DD.SIMHASH_AB[:bits])
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, list_distinct(regexp_split_to_array(text, '\\s+')) AS toks
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, list_transform(toks, t -> {_md5h60_sql('t')} % {p}) AS hs
        FROM tok
    ),
    bitcnt AS (
        SELECT doc_id, v.pw,
               len(list_filter(hs, h -> (v.a * h + v.b) % {p} % 2 = 1)) AS odd,
               len(hs) AS n
        FROM hashed, LATERAL (VALUES {rows}) v(a, b, pw)
    )
    SELECT doc_id, CAST(sum(CASE WHEN 2 * odd > n THEN pw ELSE 0 END) AS BIGINT) AS simhash
    FROM bitcnt GROUP BY doc_id
    """


@_q(
    "q26_simhash",
    _simhash_oracle_sql(),
    "64-bit SimHash fingerprint per document (shuffle-free map) over the "
    "portable md5-derived per-bit hash family (dedup.SIMHASH_AB) — "
    "DuckDB-reproducible bit-for-bit",
)
def q26_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_double_array(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"round(list_inner_product({a}, {b}) / "
        f"(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))), 6)"
    )


@_q(
    "q27_cosine_topk",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10
    ),
    c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
    ),
    s AS (
        SELECT query_id, neighbor_id, {_cosine_sql('qv', 'cv')} AS cos_sim
        FROM q, c WHERE neighbor_id != query_id
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM s
    )
    SELECT query_id, neighbor_id, cos_sim FROM r WHERE rk <= 5
    """,
    "Exact brute-force cosine top-5 ANN baseline (queries broadcast against corpus)",
)
def q27_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


def _lsh_oracle_sql(threshold: float = 0.45) -> str:
    """Mirror the banded random-projection LSH (similarity.PLANES) in
    SQL so bucket assignment is reproduced bit-for-bit."""
    band_exprs = []
    n_bands = SIM.NUM_PLANES // SIM.PLANES_PER_BAND
    for band in range(n_bands):
        bits = []
        for p in range(band * SIM.PLANES_PER_BAND, (band + 1) * SIM.PLANES_PER_BAND):
            plane = _sql_double_array(SIM.PLANES[p])
            bits.append(
                f"CASE WHEN list_inner_product(ve, {plane}) >= 0 THEN '1' ELSE '0' END"
            )
        band_exprs.append(f"({band}, " + " || ".join(bits) + ")")
    values = ", ".join(band_exprs)
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ),
    b AS (
        SELECT vec_id, ve, band, bucket
        FROM v, LATERAL (VALUES {values}) t(band, bucket)
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, r.vec_id AS id_b
        FROM b a JOIN b r ON a.band = r.band AND a.bucket = r.bucket AND a.vec_id < r.vec_id
    ),
    scored AS (
        SELECT id_a, id_b, {_cosine_sql('va.ve', 'vb.ve')} AS cos_sim
        FROM cand
        JOIN v va ON va.vec_id = id_a
        JOIN v vb ON vb.vec_id = id_b
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {threshold}
    """


@_q(
    "q28_cosine_pairs_lsh",
    _lsh_oracle_sql(),
    "Near-dup vector pairs via signed random-projection LSH buckets + exact cosine verify "
    "(the 100 TB scale path; oracle reproduces the fixed hyperplanes)",
)
def q28_cosine_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_pairs_lsh(_t(spark, sf_dir, "embeddings"), threshold=0.45)


@_q(
    "q29_embedding_stats",
    f"""
    SELECT label, count(*) AS n,
           round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_l2_norm
    FROM embeddings GROUP BY label
    """,
    "Vector column aggregation: mean L2 norm per label",
)
def q29_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.functions.vectors import l2_norm

    return (
        _t(spark, sf_dir, "embeddings")
        .select("label", l2_norm(as_double_array("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("nrm"), 6).alias("avg_l2_norm"))
    )


@_q(
    "q30_multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS magic_byte
    FROM documents
    """,
    "Opaque binary payload column + typed metadata extraction (multimodal plumbing)",
)
def q30_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.ascii(F.substring("text", 1, 1)).cast("long").alias("magic_byte"),
    )


@_q(
    "q31_stream_windows",
    """
    SELECT 'tumbling' AS kind,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'hopping' AS kind,
           CAST(floor(epoch(ts) / 1800) * 1800 - k * 1800 AS BIGINT) AS window_start_epoch,
           CAST(NULL AS VARCHAR) AS event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events CROSS JOIN (VALUES (0), (1)) t(k)
    GROUP BY 2
    """,
    "Event-time windowed aggregation, tagged per branch: tumbling 1h windows "
    "per event_type + hopping windows (1h size / 30m slide) via explicit "
    "window assignment (batch parity of the streaming pipeline)",
)
def q31_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.lit("tumbling").alias("kind"),
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type", "n", "total_value",
        )
    )
    base = F.floor(F.col("ts").cast("double") / 1800) * 1800
    hopping = (
        ev.select("value", F.explode(F.array(F.lit(0), F.lit(1))).alias("k"), base.alias("base"))
        .select((F.col("base") - F.col("k") * 1800).cast("long").alias("window_start_epoch"), "value")
        .groupBy("window_start_epoch")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.lit("hopping").alias("kind"), "window_start_epoch",
            F.lit(None).cast("string").alias("event_type"), "n", "total_value",
        )
    )
    return tumbling.unionByName(hopping)


@_q(
    "q32_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, event_id, value, ts,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 300 OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events, round(sum(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_idx
    """,
    "Session windows (5-min inactivity gap) as a batch plan; streaming twin in streaming/pipeline.py",
)
def q32_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    epoch = F.col("ts").cast("double")
    prev = F.lag(F.col("ts")).over(w).cast("double")
    flagged = ev.withColumn(
        "new_session",
        F.when((epoch - prev > 300) | prev.isNull(), 1).otherwise(0),
    )
    return (
        flagged.withColumn("session_idx", F.sum("new_session").over(wf))
        .groupBy("user_id", F.col("session_idx").cast("long").alias("session_idx"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
    )


# ---------------------------------------------------------------------------
# Advanced relational + text/vector operators (round-1 batch 3):
# range frames, grouping sets, pivot, percentiles, as-of / range joins,
# TF-IDF, BPE-ish tokenization, IVF-style ANN, array functions
# ---------------------------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

@_q(
    "q33_pivot",
    f"""
    SELECT c_nationkey,
           {", ".join(f"round(sum(CASE WHEN c_mktsegment = '{s}' THEN c_acctbal END), 2) AS {s}" for s in _SEGMENTS)}
    FROM customer GROUP BY c_nationkey
    """,
    "Pivot (wide aggregation by category)",
)
def q33_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.round(F.sum("c_acctbal"), 2))
    )
    return piv


@_q(
    "q34_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    "Exact interpolated percentiles per group",
)
def q34_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
    )


@_q(
    "q35_asof_join",
    """
    WITH cand AS (
        SELECT a.event_id, b.event_id AS view_id, b.ts AS view_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        JOIN (SELECT * FROM events WHERE event_type = 'view') b
          ON a.user_id = b.user_id AND b.ts <= a.ts
    ), r AS (
        SELECT event_id, view_id,
               row_number() OVER (PARTITION BY event_id
                                  ORDER BY view_ts DESC, view_id DESC) AS rn
        FROM cand
    )
    SELECT event_id, view_id AS matched_view_id FROM r WHERE rn = 1
    """,
    "As-of join: each purchase matched to the user's most recent prior view "
    "(ties on view ts broken by max view event_id — deterministic across "
    "engines). Implemented scale-first as union + ordered window (one shuffle "
    "on the key, no range-join explosion) — the standard merge formulation",
)
def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts"), F.lit(1).alias("is_left"),
        F.lit(None).cast("long").alias("right_id"),
    )
    right = ev.where(F.col("event_type") == "view").select(
        F.col("event_id"), F.col("user_id"), F.col("ts"), F.lit(0).alias("is_left"),
        F.col("event_id").alias("right_id"),
    )
    # At equal ts the right rows sort first (is_left asc), so `ts >=`
    # semantics hold; among equal-ts views the largest event_id sorts
    # last and wins — a deterministic tie-break mirrored in the oracle's
    # max_by ordering. last(ignorenulls) carries that view id forward.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "matched_view_id", F.last("right_id", ignorenulls=True).over(w)
    )
    return (
        merged.where((F.col("is_left") == 1) & F.col("matched_view_id").isNotNull())
        .select("event_id", "matched_view_id")
    )


@_q(
    "q36_range_join",
    """
    SELECT a.event_id, b.event_id AS view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    JOIN (SELECT * FROM events WHERE event_type = 'view') b
      ON a.user_id = b.user_id
     AND b.ts <= a.ts
     AND epoch(a.ts) - epoch(b.ts) <= 86400
    """,
    "Range (interval) join: views within 24h before each purchase",
)
def q36_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").alias("a")
    b = ev.where(F.col("event_type") == "view").alias("b")
    a_ts = F.col("a.ts").cast("double")
    b_ts = F.col("b.ts").cast("double")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") <= F.col("a.ts"))
            & (a_ts - b_ts <= 86400),
        )
        .select(F.col("a.event_id").alias("event_id"), F.col("b.event_id").alias("view_id"))
    )


@_q(
    "q37_tfidf_top_term",
    """
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(n.n_docs * 1.0 / dfreq.df), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        FROM scored
    )
    SELECT doc_id, term AS top_term, tfidf FROM ranked WHERE rk = 1
    """,
    "TF-IDF scoring; most characteristic term per document",
)
def q37_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # dfreq is NOT broadcast-hinted: one row per distinct term means a
    # web-scale vocabulary of billions — AQE broadcasts it dynamically
    # when small. The 1-row count IS structurally bounded, so its hint
    # stays.
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tfidf")
    )


from dataflow_python_etl_spark.functions.text import BPE_RE as _BPE_RE  # noqa: E402  (single source of the q38 segmentation)

@_q(
    "q38_bpe_token_count",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_subtokens
    FROM documents
    """,
    "BPE-ish subword token counting via regex segmentation",
)
def q38_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).cast("long").alias("n_subtokens"),
    )


# IVF-style ANN: K fixed centroids (seeded literals, mirrored in the
# oracle); vectors are indexed by nearest centroid, queries probe only
# their own centroid's bucket, hits are re-ranked by exact cosine.
def _gen_centroids(dim: int = 64, k: int = 8, seed: int = 11) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[round(float(v), 6) for v in rng.randn(dim)] for _ in range(k)]


CENTROIDS: list[list[float]] = _gen_centroids()


def _centroid_assign_spark(vec_sql: str, norm_sql: str | None = None):
    # Single aggregate argmax over the zipped (score, index) array:
    # the array_position(scores, array_max(scores)) spelling evaluates
    # the interpreted K-cosine array TWICE per row (CLAUDE.md sibling-
    # expression pitfall). Element values and the first-max tie rule
    # are identical to the oracle's list_indexof(scores, list_max(..)),
    # so hashes are unchanged — only the plan cost halves.
    #
    # ``norm_sql`` (optional): SQL text of a column holding
    # l2_norm(vec) precomputed ONCE per row — the inline ``cosine()``
    # spelling re-folds the 64-element vector norm once per centroid
    # (K× per row, interpreted HOF). Identical doubles: cosine()
    # evaluates dot/(l2_norm(a)·l2_norm(b)) in exactly this operand
    # order. The scores array renders as ONE parsed SQL expression
    # (optimization r12: the Column-API spelling cost K·2D py4j
    # literal round-trips per plan build; Catalyst tree identical —
    # the constant centroid norms still fold at optimize time).
    from dataflow_python_etl_spark.functions.vectors import (
        darr,
        dot_sql,
        l2_norm_sql,
    )

    if norm_sql is None:
        norm_sql = l2_norm_sql(vec_sql)
    scores = F.expr(
        "array("
        + ", ".join(
            f"({dot_sql(vec_sql, darr(c))}"
            f" / ({norm_sql} * {l2_norm_sql(darr(c))}))"
            for c in CENTROIDS
        )
        + ")"
    )
    return F.aggregate(
        F.arrays_zip(
            scores.alias("s"),
            F.sequence(F.lit(1), F.lit(len(CENTROIDS))).alias("i"),
        ),
        F.struct(
            F.lit(float("-inf")).alias("s"), F.lit(0).cast("integer").alias("i")
        ),
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
        lambda acc: acc["i"].cast("long"),
    )


def _ivf_oracle_sql() -> str:
    score_list = ", ".join(
        _cosine_sql("ve", _sql_double_array(c)).replace("round(", "(", 1).replace(", 6)", ")", 1)
        for c in CENTROIDS
    )
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ),
    assigned AS (
        SELECT vec_id, ve,
               list_indexof([{score_list}], list_max([{score_list}])) AS cid
        FROM v
    ),
    q AS (SELECT vec_id AS query_id, ve AS qv, cid FROM assigned WHERE vec_id < 10),
    s AS (
        SELECT q.query_id, a.vec_id AS neighbor_id,
               {_cosine_sql('q.qv', 'a.ve')} AS cos_sim
        FROM q JOIN assigned a ON a.cid = q.cid AND a.vec_id != q.query_id
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM s
    )
    SELECT query_id, neighbor_id, cos_sim FROM r WHERE rk <= 3
    """


@_q(
    "q39_ivf_ann",
    _ivf_oracle_sql(),
    "IVF-bucketed ANN: nearest-centroid index + in-bucket exact re-rank "
    "(probes 1/K of the corpus; oracle reproduces the fixed centroids)",
)
def q39_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.functions.vectors import dot, l2_norm
    from dataflow_python_etl_spark.operators.dedup import register_cache

    emb = _t(spark, sf_dir, "embeddings")
    # Optimization r11 (guide §1.2 per-task work + §5 caching):
    #  - the vector norm is folded ONCE per row and reused by all 8
    #    centroid cosines AND the pair-stage cosine (the inline
    #    spelling re-folded the 64-element norm 8× per corpus row and
    #    2× more per candidate pair — all interpreted HOFs);
    #  - ``assigned`` sits behind a registered cache: it fed both the
    #    corpus side and the broadcast query side, so the whole
    #    assignment map ran twice per action.
    # Same doubles in the same operand order throughout → identical
    # cid assignment, identical rounded cosines, unchanged oracle hash.
    v = emb.select("vec_id", as_double_array("embedding").alias("ve")).withColumn(
        "nv", l2_norm(F.col("ve"))
    )
    assigned = register_cache(
        v.withColumn("cid", _centroid_assign_spark("ve", "nv"))
    )
    q = assigned.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("ve").alias("qv"),
        F.col("nv").alias("qn"),
        "cid",
    )
    a = assigned.alias("a")
    scored = (
        a.join(
            F.broadcast(q.alias("q")),
            (F.col("a.cid") == F.col("q.cid")) & (F.col("a.vec_id") != F.col("q.query_id")),
        )
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("q.qv"), F.col("a.ve"))
                / (F.col("q.qn") * F.col("a.nv")),
                6,
            ),
        )
        .select(F.col("q.query_id").alias("query_id"), F.col("a.vec_id").alias("neighbor_id"), "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@_q(
    "q40_array_funcs",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           toks[1] AS first_token,
           toks[-1] AS last_token,
           list_contains(toks, 'the') AS has_the,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted
    FROM tok
    """,
    "Array functions: distinct/sort/slice/contains/element access over token arrays",
)
def q40_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = TX.tokens("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias("first3_sorted"),
    )


# ---------------------------------------------------------------------------
# Ingest parity (oracle-checked CSV), UDAF via applyInPandas, UDTF
# ---------------------------------------------------------------------------

# A deterministic pasajero-shaped fixture written INSIDE the repo so
# both engines can read the identical bytes. Covers the reference's
# edge cases: '+'-phone, slash dates, empty birthdate, quoted commas,
# 1-token and repeated-first-char names.
_INGEST_FIXTURE = Path(__file__).resolve().parent.parent / ".fixtures" / "pasajero_fixture.csv"
_INGEST_ROWS = [
    '10000000-1|Ada Lovelace Byron|ada@example.com|"1 Analytical Way, London"|+56910000001|1950/01/15',
    "20000000-2|Bob Marley|bob@example.com|56 Hope Road|+56920000002|2015/06/01",
    "30000000-3|Solo|solo@example.com|Nowhere 3|+56930000003|1999/12/31",
    "40000000-4|X Bab Bub|x@example.com|Round St 4|not_a_phone|2020/02/29",
    "50000000-5|Eve Evergreen Everest|eve@example.com|Elm 5|+56950000005|",
]


def _ensure_ingest_fixture() -> str:
    _INGEST_FIXTURE.parent.mkdir(exist_ok=True)
    content = "\n".join(_INGEST_ROWS) + "\n"
    if not _INGEST_FIXTURE.exists() or _INGEST_FIXTURE.read_text() != content:
        _INGEST_FIXTURE.write_text(content)
    return str(_INGEST_FIXTURE)


_ensure_ingest_fixture()

@_q(
    "q41_csv_ingest",
    f"""
    SELECT dni, nombre_completo, correo_electronico, direccion,
           TRY_CAST(replace(telefono, '+', '') AS BIGINT) AS telefono,
           TRY_CAST(replace(fecha_de_nacimiento, '/', '-') AS DATE) AS fecha_de_nacimiento
    FROM read_csv('{_ensure_ingest_fixture()}',
                  delim='|', header=false, quote='"',
                  columns={{'dni': 'VARCHAR', 'nombre_completo': 'VARCHAR',
                           'correo_electronico': 'VARCHAR', 'direccion': 'VARCHAR',
                           'telefono': 'VARCHAR', 'fecha_de_nacimiento': 'VARCHAR'}})
    """,
    "Typed pipe-CSV ingest with dirty-data policy (operators O1-O5; "
    "oracle reads the identical fixture file)",
)
def q41_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.schema import bq_schema_to_struct
    from dataflow_python_etl_spark.sources.csv_ingest import read_typed_csv

    schema = bq_schema_to_struct(
        [
            {"name": "dni", "type": "STRING"},
            {"name": "nombre_completo", "type": "STRING"},
            {"name": "correo_electronico", "type": "STRING"},
            {"name": "direccion", "type": "STRING"},
            {"name": "telefono", "type": "INTEGER"},
            {"name": "fecha_de_nacimiento", "type": "DATE"},
        ]
    )
    return read_typed_csv(spark, _ensure_ingest_fixture(), schema)


@_q(
    "q42_custom_aggs",
    """
    WITH g AS (
        SELECT event_type, count(*) AS n,
               round(exp(avg(ln(value))), 6) AS geo_mean
        FROM events WHERE value > 0 GROUP BY event_type
    ), w AS (
        SELECT event_type,
               round(sum(value * user_id) / sum(user_id), 6) AS weighted_mean
        FROM events WHERE user_id > 0 GROUP BY event_type
    )
    SELECT g.event_type, g.n, g.geo_mean, w.weighted_mean
    FROM g JOIN w ON g.event_type = w.event_type
    """,
    "Both custom-aggregate surfaces in one plan: geometric mean via "
    "applyInPandas (Arrow-batched per-group kernel) joined with a weighted "
    "mean via grouped-agg pandas UDF (Arrow series -> scalar); oracle uses "
    "the closed forms",
)
def q42_custom_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("geo_mean", T.DoubleType()),
        ]
    )

    def geomean(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(v)],
                "geo_mean": [round(float(np.exp(np.mean(np.log(v)))), 6)],
            }
        )

    # Modern pandas_udf signature inference (the PandasUDFType enum is
    # deprecated): `from __future__ import annotations` stringifies
    # inline hints and pd only exists in FUNCTION scope, so
    # get_type_hints could not resolve them — attach real class
    # objects to __annotations__ instead; Series->scalar hints infer
    # the grouped-agg eval type.
    def _wmean(v, w):
        return round(float((v * w).sum() / w.sum()), 6)

    _wmean.__annotations__ = {"v": pd.Series, "w": pd.Series, "return": float}
    wmean = pandas_udf(_wmean, "double")

    ev = _t(spark, sf_dir, "events")
    g = (
        ev.where(F.col("value") > 0)
        .select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(geomean, out_schema)
    )
    w = (
        ev.where(F.col("user_id") > 0)
        .groupBy("event_type")
        .agg(wmean(F.col("value"), F.col("user_id").cast("double")).alias("weighted_mean"))
    )
    return g.join(w, "event_type")


@_q(
    "q43_udtf_ngrams",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    )
    SELECT doc_id, CAST(i AS INTEGER) AS pos, array_to_string(toks[i:i+1], ' ') AS bigram
    FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
    WHERE len(toks) >= 2
    """,
    "Python UDTF (table function): one row per token bigram with position",
)
def q43_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf, lit

    @udtf(returnType="doc_id: bigint, pos: int, bigram: string")
    class BigramUDTF:
        def eval(self, doc_id: int, text: str):
            toks = text.split()
            for i in range(len(toks) - 1):
                yield doc_id, i + 1, f"{toks[i]} {toks[i + 1]}"

    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_q43")
    spark.udtf.register("bigrams_q43", BigramUDTF)
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM documents_q43 d, LATERAL bigrams_q43(d.doc_id, d.text) b"
    )


# ---------------------------------------------------------------------------
# Statistical aggregates, unpivot, correlated subqueries, fuzzy matching
# ---------------------------------------------------------------------------

@_q(
    "q44_approx_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS cnt,
           TRUE AS err_ok
    FROM events GROUP BY event_type
    """,
    "Approximate distinct (HyperLogLog) per group — the 100 TB cardinality "
    "path. HLL sketches are engine-specific, so the raw estimate can't "
    "hash-match DuckDB; instead the 3·rsd accuracy bound is computed "
    "IN-PLAN (err_ok) and the oracle returns the exact count + literal "
    "TRUE — the sketch's accuracy itself is driver-hash-verified.",
)
def q44_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    rsd = 0.05
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "event_type",
            "exact_users",
            "cnt",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                <= F.lit(3 * rsd) * F.col("exact_users")
            ).alias("err_ok"),
        )
    )


@_q(
    "q45_unpivot",
    """
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    """,
    "Unpivot (wide → long): one row per (entity, metric)",
)
def q45_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
        ),
    )


@_q(
    "q46_correlated_subquery",
    """
    SELECT o_orderkey,
           (SELECT max(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_qty
    FROM orders
    """,
    "Correlated scalar subquery — the reference's per-row aggregation shape "
    "(datalake_compensation.py:98-115) written declaratively; Catalyst "
    "decorrelates it into an aggregate + join (plan-pinned, no per-row exec)",
)
def q46_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q46")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q46")
    return spark.sql(
        """
        SELECT o_orderkey,
               (SELECT max(l_quantity) FROM lineitem_q46 WHERE l_orderkey = o_orderkey) AS max_qty
        FROM orders_q46
        """
    )


# ---------------------------------------------------------------------------
# Flagship composition: training-corpus cleaning + dup clustering
# ---------------------------------------------------------------------------

@_q(
    "q47_clean_corpus",
    f"""
    WITH x AS (
        SELECT doc_id, text,
               regexp_split_to_array(text, '\\s+') AS toks,
               length(text) AS nch,
               length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS npunct
        FROM documents
    ), scored AS (
        SELECT doc_id, text, len(toks) AS ntok,
               round(
                 least(len(toks) / 100.0, 1.0) * 0.4
                 + least((len(list_filter(toks, t -> list_contains({_STOPWORD_SQL_LIST}, t)))
                          * 1.0 / greatest(len(toks), 1)) * 5.0, 1.0) * 0.3
                 + (1.0 - least((npunct * 1.0 / greatest(nch, 1)) * 10.0, 1.0)) * 0.3,
               6) AS quality
        FROM x
    ), kept AS (
        SELECT * FROM scored WHERE quality >= 0.3
    ), tok2 AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM kept
    ), sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM tok2, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) u
        WHERE len(toks) >= 3
    ), hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 64),
    sh AS (SELECT * FROM sh0 ANTI JOIN hot USING (shingle)),
    sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
    co AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT doc_a, doc_b FROM co
        JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        WHERE c * 1.0 / (sa.s + sb.s - c) >= 0.5
    ), removals AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
    SELECT k.doc_id, CAST(len(regexp_split_to_array(k.text, '\\s+')) AS BIGINT) AS n_tokens,
           k.quality
    FROM kept k ANTI JOIN removals r ON k.doc_id = r.doc_id
    """,
    "Flagship LLM-corpus cleaning composition: quality gate → 3-gram "
    "near-dup removal → per-doc stats, one lazy plan end to end",
)
def q47_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import clean_corpus

    return clean_corpus(_t(spark, sf_dir, "documents"))


@_q(
    "q48_dup_clusters",
    # The Spark side is iterative (pointer-jump label propagation), but
    # its FIXPOINT is declarative: min reachable id per node — which a
    # recursive CTE over the same pair set expresses exactly. Also
    # pinned against a Python union-find in tests/test_corpus.py.
    f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT src AS node, src AS lab FROM edges
        UNION
        SELECT e.src AS node, r.lab
        FROM edges e JOIN reach r ON e.dst = r.node
    )
    SELECT node, min(lab) AS cluster FROM reach GROUP BY node
    """,
    "Connected components over the near-dup graph (iterative min-label "
    "propagation with lineage checkpoints; oracle = recursive-CTE min "
    "reachable id)",
)
def q48_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import dup_clusters

    pairs = DD.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_shingle_df=64
    )
    return dup_clusters(pairs)


# ---------------------------------------------------------------------------
# Time-interval frames, deterministic sampling, null semantics, rank family
# ---------------------------------------------------------------------------

@_q(
    "q49_time_range_frame",
    """
    SELECT event_id, user_id,
           count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS events_last_hour
    FROM events
    """,
    "Time-based RANGE frame: trailing 1h event count per user",
)
def q49_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_q49")
    return spark.sql(
        """
        SELECT event_id, user_id,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS events_last_hour
        FROM events_q49
        """
    )


@_q(
    "q50_deterministic_sample",
    """
    SELECT doc_id, lang FROM documents
    WHERE ((doc_id % 100000007) * 2654435761) % 100 < 10
    """,
    "Deterministic ~10% sample via multiplicative hashing — reproducible "
    "across engines and runs, unlike TABLESAMPLE. The id is reduced mod a "
    "prime BEFORE the Knuth multiply so the product stays < 2^63 for any "
    "64-bit doc_id (no ANSI overflow / silent wrap at real scale)",
)
def q50_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .where(((F.col("doc_id") % 100000007) * 2654435761) % 100 < 10)
        .select("doc_id", "lang")
    )


@_q(
    "q51_bpe_chunk_accounting",
    f"""
    WITH t AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{_BPE_RE}')) AS n
        FROM documents
    ),
    s AS (
        SELECT doc_id, n, unnest(range(0, greatest(n, 1), 56)) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(least(64, n - start)) AS BIGINT) AS chunk_tokens
    FROM s
    WHERE (start = 0 AND n > 0) OR (start + 8 < n)
    GROUP BY doc_id
    """,
    "BPE-budget chunking accounting (operators.chunking.chunk_documents "
    "token_mode='bpe', window 64 / overlap 8): per-doc chunk count and "
    "total chunk-token mass, mirrored in SQL from the window-start rule "
    "(starts 0, 56, ...; a start is emitted unless its window only "
    "re-covers the previous one). Puts the chunking operator itself on "
    "the hash gate, not just pytest",
)
def q51_bpe_chunk_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.chunking import chunk_documents

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        chunk_tokens=64,
        overlap_tokens=8,
        token_mode="bpe",
    )
    return chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("chunk_tokens"),
    )


_SPLIT_U = "(" + _md5h60_sql("'split-v1:' || source") + ") / 1152921504606846976.0"


@_q(
    "q52_leakage_split",
    f"""
    SELECT doc_id, source,
           CASE WHEN {_SPLIT_U} < 0.8 THEN 'train'
                WHEN {_SPLIT_U} < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    "Leakage-proof group-cohesive dataset split "
    "(operators.corpus.split_by_group on the source domain): every doc "
    "of a domain lands in the same split via the portable 60-bit md5 "
    "hash, so the assignment is identical across engines, runs, and "
    "corpus growth — mirrored exactly in DuckDB, putting the split "
    "operator on the hash gate",
)
def q52_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import split_by_group

    return split_by_group(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        "source",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


@_q(
    "q53_domain_quota",
    """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
    "Per-domain quota (operators.corpus.cap_per_key) run in its SALTED "
    "two-phase form (salt_buckets=8, the hot-key 100 TB spelling) against "
    "a plain single-window oracle — the 'provably identical output' "
    "argument of the salted rewrite, verified by value hash instead of "
    "only argued in the docstring",
)
def q53_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import cap_per_key

    return cap_per_key(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        ["source"],
        20,
        ["doc_id"],
        salt_buckets=8,
    )


@_q(
    "q54_incremental_minhash_pairs",
    _minhash_oracle_sql(
        extra_where=" AND (doc_a % 10 >= 8 OR doc_b % 10 >= 8)"
    ),
    "Incremental batch-vs-corpus MinHash dedup "
    "(operators.dedup.minhash_lsh_pairs_incremental): corpus = 80% of "
    "documents (doc_id % 10 < 8), batch = the rest; the operator signs "
    "ONLY the batch and probes the corpus band index, and must equal the "
    "full-corpus LSH pair set restricted to pairs touching >=1 batch doc "
    "— the equivalence previously pytest-only, now value-hash-verified "
    "against the same DuckDB CTE family as q25",
)
def q54_incremental_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 < 8)
    batch = docs.where(F.col("doc_id") % 10 >= 8)
    return DD.minhash_lsh_pairs_incremental(corpus, batch, None, "doc_id", "text")


_LINES_SQL = "list_filter(string_split(text, chr(10)), x -> trim(x) != '')"


@_q(
    "q55_repetition_metrics",
    f"""
    WITH l AS (SELECT doc_id, {_LINES_SQL} AS lines, text FROM documents)
    SELECT doc_id,
           round(CASE WHEN len(lines) > 0
                 THEN (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines)
                 ELSE 0.0 END, 6) AS dup_lines,
           round(CASE WHEN list_sum(list_transform(lines, x -> length(x))) > 0
                 THEN (list_sum(list_transform(lines, x -> length(x)))
                       - list_sum(list_transform(list_distinct(lines), x -> length(x))))
                      * 1.0 / list_sum(list_transform(lines, x -> length(x)))
                 ELSE 0.0 END, 6) AS dup_chars,
           round(CASE WHEN len(lines) > 0
                 THEN len(list_filter(lines, x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$')))
                      * 1.0 / len(lines)
                 ELSE 0.0 END, 6) AS ellipsis_lines,
           round(CASE WHEN len(regexp_split_to_array(text, '\\s+')) > 0
                 THEN (length(text) - length(regexp_replace(text, '[#…•*>|]', '', 'g')))
                      * 1.0 / len(regexp_split_to_array(text, '\\s+'))
                 ELSE 0.0 END, 6) AS symbol_ratio
    FROM l
    """,
    "Gopher-style repetition/boilerplate metrics "
    "(functions.text.dup_line_fraction / dup_line_char_fraction / "
    "ellipsis_line_fraction / symbol_word_ratio) — the q47 quality "
    "gate's signals, individually value-hash-verified against a DuckDB "
    "list-expression mirror",
)
def q55_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        TX.dup_line_fraction("text").alias("dup_lines"),
        TX.dup_line_char_fraction("text").alias("dup_chars"),
        TX.ellipsis_line_fraction("text").alias("ellipsis_lines"),
        TX.symbol_word_ratio("text").alias("symbol_ratio"),
    )


def _pii_oracle_sql() -> str:
    expr = "text"
    for pattern, token in TX._PII_PATTERNS:
        sql_pat = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{token}', 'g')"
    return f"SELECT doc_id, {expr} AS scrubbed FROM documents"


@_q(
    "q56_pii_scrub",
    _pii_oracle_sql(),
    "PII scrubbing (functions.text.pii_scrub): the exact chained "
    "regexp_replace tree (emails, IPs, SSNs, phones, card-like digit "
    "runs -> typed placeholders) mirrored pattern-for-pattern in DuckDB "
    "(RE2-compatible patterns by construction — no lookarounds), so the "
    "scrubbed TEXT itself is value-hash-verified, not just row counts",
)
def q56_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", TX.pii_scrub("text").alias("scrubbed")
    )


_STRAT_U = "(" + _md5h60_sql("'strat-v1:' || doc_id::VARCHAR") + ") / 1152921504606846976.0"


@_q(
    "q57_stratified_sample",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_STRAT_U} < CASE lang WHEN 'en' THEN 0.2
                                 WHEN 'zh' THEN 0.9
                                 ELSE 0.5 END
    """,
    "Deterministic per-stratum corpus rebalancing "
    "(operators.corpus.stratified_sample): downsample dominant 'en' to "
    "20%, boost tail 'zh' to 90%, 50% elsewhere — content-addressed "
    "(portable md5 of the doc id), so membership is identical across "
    "engines, runs, and partitionings, unlike sampleBy's RNG streams; "
    "mirrored exactly in DuckDB",
)
def q57_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        "lang",
        {"en": 0.2, "zh": 0.9},
        "doc_id",
        default_rate=0.5,
    )


@_q(
    "q58_lm_perplexity",
    """
    WITH g AS (
        SELECT doc_id, lang,
               unnest(list_transform(
                   range(1, greatest(length(lower(text)) - 2, 0) + 1),
                   i -> substr(lower(text), i, 3))) AS ngram
        FROM documents
    ),
    counts AS (SELECT lang, ngram, count(*) AS c FROM g GROUP BY 1, 2),
    vocab AS (SELECT count(DISTINCT ngram) AS v FROM counts),
    totals AS (SELECT lang, sum(c) AS total FROM counts GROUP BY 1),
    model AS (
        SELECT lang, ngram, ln((c + 0.5) / (total + 0.5 * v)) AS logp
        FROM counts JOIN totals USING (lang), vocab
    ),
    floors AS (
        SELECT lang, ln(0.5 / (total + 0.5 * v)) AS floor_logp
        FROM totals, vocab
    )
    SELECT g.doc_id, g.lang,
           round(avg(coalesce(m.logp, f.floor_logp)), 6) AS avg_logp
    FROM g
    LEFT JOIN model m ON m.lang = g.lang AND m.ngram = g.ngram
    JOIN floors f ON f.lang = g.lang
    GROUP BY 1, 2
    """,
    "Character-trigram LM perplexity scoring (operators.lm — the "
    "CCNet/Gopher corpus-quality signal): fit per-language add-alpha "
    "models on the corpus (one explode + groupBy; the model is a "
    "DataFrame, never driver-sized) and score every document's mean "
    "log-prob under its own language's model (broadcast join + "
    "map-side-combined mean; unseen grams hit the smoothing floor). "
    "Fit AND score mirrored end-to-end in DuckDB — deterministic "
    "counts + IEEE doubles make even the ln() pipeline hash-stable "
    "at 6 decimals",
)
def q58_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.lm import fit_and_score

    # fit-and-score share ONE cached n-gram explode (the model corpus
    # IS the scored corpus here); see lm.fit_and_score
    return fit_and_score(_t(spark, sf_dir, "documents").select("doc_id", "lang", "text"))


@_q(
    "q59_simhash_pairs",
    f"""
    WITH s AS ({_simhash_oracle_sql()}),
    b AS (
        SELECT doc_id, simhash, band,
               (simhash >> (band * 16)) & 65535 AS val
        FROM s, LATERAL (SELECT unnest(range(0, 4)) AS band) u
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
    FROM b x JOIN b y
      ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
    """,
    "SimHash Hamming-distance pair search "
    "(operators.dedup.simhash_pairs, radius 3 over 4 bands): EXACT by "
    "pigeonhole — signatures within hamming 3 must agree on one of 4 "
    "disjoint 16-bit blocks, so banded candidates miss nothing (pinned "
    "against brute force in pytest); verification is one "
    "bit_count(xor), no second text pass. Completes the SimHash tier "
    "from fingerprint (q26) to pair search, hash-verified",
)
def q59_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3, n_bands=4
    ).withColumn("hamming", F.col("hamming").cast("long"))


@_q(
    "q60_normalized_dedup",
    """
    WITH norm AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS content_key
        FROM documents
    )
    SELECT min(doc_id) AS doc_id, content_key,
           count(*) AS n_variants
    FROM norm GROUP BY content_key
    """,
    "Fuzzy-exact dedup (operators.dedup.dedup_normalized, the C4 "
    "recipe): group by md5 of the case/punctuation/whitespace-"
    "normalized text, min-id survivor — the tier between byte-exact "
    "(q23) and n-gram Jaccard (q24), at exact-dedup cost; the "
    "normalization chain and md5 are mirrored bit-for-bit in DuckDB",
)
def q60_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.dedup_normalized(_t(spark, sf_dir, "documents"))


@_q(
    "q61_line_dedup",
    f"""
    WITH l AS (SELECT doc_id, {_LINES_SQL} AS lines FROM documents),
    k AS (
        SELECT doc_id, lines,
               list_filter(range(1, len(lines) + 1),
                           i -> list_position(lines, lines[i]) = i) AS keep
        FROM l
    )
    SELECT doc_id,
           array_to_string(list_transform(keep, i -> lines[i]), chr(10)) AS cleaned,
           CAST(len(lines) - len(keep) AS BIGINT) AS n_removed
    FROM k
    """,
    "In-document repeated-line removal (functions.text.dedup_lines — "
    "boilerplate/nav-menu stripping, first occurrence kept): one "
    "first-index HOF expression, zero-shuffle; the CLEANED TEXT itself "
    "is value-hash-verified against the DuckDB list-expression mirror",
)
def q61_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lines = F.filter(F.split(F.col("text"), "\n"), lambda x: F.trim(x) != "")
    return docs.select(
        "doc_id",
        TX.dedup_lines("text").alias("cleaned"),
        (F.size(lines) - F.size(F.array_distinct(lines))).cast("long").alias("n_removed"),
    )


@_q(
    "q62_semantic_dedup",
    f"""
    WITH pairs AS ({_lsh_oracle_sql(threshold=0.45)}),
    removals AS (SELECT DISTINCT id_b FROM pairs)
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN removals r ON d.doc_id = r.id_b
    WHERE r.id_b IS NULL
    """,
    "Embedding-cosine near-dup removal end-to-end "
    "(operators.corpus.semantic_dedup): RP-LSH candidate pairs over "
    "the embeddings (same fixed-hyperplane family the q28 oracle "
    "reproduces bit-for-bit), higher id of each pair >= threshold "
    "removed, survivors anti-joined back onto the documents — the "
    "semantic tier of the dedup family (paraphrases that Jaccard/"
    "MinHash/SimHash never see), hash-verified end-to-end",
)
def q62_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        threshold=0.45,
    ).select("doc_id", "source")


@_q(
    "q63_contamination_check",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM tok, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) u
        WHERE len(toks) >= 3
    ),
    ev AS (SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 25 = 0),
    corp AS (SELECT * FROM sh0 WHERE doc_id % 25 <> 0),
    hit AS (
        SELECT doc_id, count(*) AS n_overlap
        FROM corp JOIN ev USING (shingle) GROUP BY doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY doc_id)
    SELECT h.doc_id, n_shingles, n_overlap,
           round(n_overlap * 1.0 / greatest(n_shingles, 1), 6) AS overlap_frac
    FROM hit h JOIN sz USING (doc_id)
    """,
    "Benchmark decontamination (operators.dedup.contamination_check): "
    "corpus docs sharing 3-gram shingles with the held-out eval slice "
    "(doc_id % 25 = 0 plays the benchmark) — the GPT-3-appendix-style "
    "train/test collision check. Corpus side is explode + BROADCAST "
    "join against the eval gram set (nothing corpus-sized shuffles; "
    "only hit rows reach the per-doc agg), hash-verified end-to-end",
)
def q63_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.contamination_check(
        docs.where(F.col("doc_id") % 25 != 0),
        docs.where(F.col("doc_id") % 25 == 0),
    )


@_q(
    "q64_span_dedup",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    g AS (
        SELECT doc_id, i, md5(array_to_string(toks[i:i+7], ' ')) AS gh
        FROM tok, LATERAL (SELECT unnest(range(1, len(toks) - 6)) AS i)
        WHERE len(toks) >= 8
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
    st AS (
        SELECT doc_id, list(DISTINCT i) AS starts
        FROM g JOIN dup USING (gh) GROUP BY doc_id
    ),
    j AS (
        SELECT t.doc_id, t.toks, coalesce(s.starts, []) AS starts
        FROM tok t LEFT JOIN st s USING (doc_id)
    ),
    k AS (
        SELECT doc_id, toks,
               list_filter(range(1, len(toks) + 1),
                   j -> len(list_filter(starts, q -> q <= j AND q > j - 8)) = 0
               ) AS kept
        FROM j
    )
    SELECT doc_id,
           coalesce(array_to_string(list_transform(kept, j -> toks[j]), ' '), '')
               AS cleaned,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
    FROM k
    """,
    "Cross-document exact-substring (span) dedup "
    "(operators.dedup.dedup_spans, Lee et al. 2022): every >=8-token "
    "run appearing in >=2 documents is removed from ALL documents — "
    "the sequence-level tier doc-level MinHash cannot see. Token "
    "8-gram starts keyed by md5, one aggregation finds cross-doc "
    "grams, a semi-join keeps duplicated starts, and the removal mask "
    "is a JVM higher-order filter; the CLEANED TEXT itself is "
    "value-hash-verified against the DuckDB list-expression mirror",
)
def q64_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.dedup_spans(_t(spark, sf_dir, "documents"), n=8)


@_q(
    "q65_chunk_text",
    """
    WITH tok AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')
                   AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, toks, len(toks) AS n,
               list_filter(range(0, greatest(len(toks) - 1, 0) + 1, 24),
                   st -> (st = 0 AND len(toks) > 0) OR st + 8 < len(toks)
               ) AS starts
        FROM tok
    ),
    c AS (
        SELECT doc_id, toks, n,
               unnest(starts) AS st,
               generate_subscripts(starts, 1) - 1 AS chunk_id
        FROM s
    )
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(st AS INTEGER) AS token_start,
           CAST(least(32, n - st) AS INTEGER) AS n_tokens,
           array_to_string(toks[st + 1:st + 32], ' ') AS chunk_text
    FROM c
    """,
    "Overlapping token-window chunking with the chunk TEXT itself "
    "hash-verified (operators.chunking.chunk_documents, 32-token "
    "windows / 8 overlap): q51 pins the token accounting, this pins "
    "the exact content and window rule (final short chunk kept, "
    "fully-contained windows suppressed) cross-engine",
)
def q65_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, overlap_tokens=8
    )


@_q(
    "q66_span_dedup_keep_first",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    g AS (
        SELECT doc_id, i, md5(array_to_string(toks[i:i+7], ' ')) AS gh
        FROM tok, LATERAL (SELECT unnest(range(1, len(toks) - 6)) AS i)
        WHERE len(toks) >= 8
    ),
    dup AS (
        SELECT gh, min(doc_id) AS keeper
        FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
    ),
    st AS (
        SELECT g.doc_id, list(DISTINCT g.i) AS starts
        FROM g JOIN dup USING (gh) WHERE g.doc_id != dup.keeper
        GROUP BY g.doc_id
    ),
    j AS (
        SELECT t.doc_id, t.toks, coalesce(s.starts, []) AS starts
        FROM tok t LEFT JOIN st s USING (doc_id)
    ),
    k AS (
        SELECT doc_id, toks,
               list_filter(range(1, len(toks) + 1),
                   j -> len(list_filter(starts, q -> q <= j AND q > j - 8)) = 0
               ) AS kept
        FROM j
    )
    SELECT doc_id,
           coalesce(array_to_string(list_transform(kept, j -> toks[j]), ' '), '')
               AS cleaned,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
    FROM k
    """,
    "Span dedup under the KEEP-FIRST policy "
    "(operators.dedup.dedup_spans(policy='keep_first')): each "
    "duplicated >=8-token run survives intact in the lowest-id "
    "document carrying it and is cut everywhere else — the Lee et al. "
    "alternative to q64's remove-all-copies, cleaned text itself "
    "hash-verified",
)
def q66_span_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.dedup_spans(
        _t(spark, sf_dir, "documents"), n=8, policy="keep_first"
    )


@_q(
    "q67_gopher_rules",
    f"""
    WITH x AS (
        SELECT doc_id, text,
               regexp_split_to_array(text, '\\s+') AS toks,
               list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS lines,
               length(text) AS nch,
               length(text) - length(regexp_replace(text, '[#…•*>|]', '', 'g')) AS nsym
        FROM documents
    ), y AS (
        SELECT doc_id,
               len(toks) AS ntok,
               list_sum(list_transform(toks, t -> length(t))) * 1.0
                   / greatest(len(toks), 1) AS mwl,
               round(CASE WHEN len(toks) > 0
                     THEN nsym * 1.0 / len(toks) ELSE 0.0 END, 6) AS sym,
               round(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                   * 1.0 / greatest(len(toks), 1), 6) AS alpha,
               len(list_filter({_STOPWORD_SQL_LIST},
                   s -> list_contains(toks, s))) AS kinds,
               round(CASE WHEN len(lines) > 0
                     THEN len(list_filter(lines,
                              l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$')))
                          * 1.0 / len(lines) ELSE 0.0 END, 6) AS ell,
               round(CASE WHEN len(lines) > 0
                     THEN len(list_filter(lines,
                              l -> regexp_matches(trim(l), '^[-*•>]')))
                          * 1.0 / len(lines) ELSE 0.0 END, 6) AS bullet,
               round(CASE WHEN len(lines) > 0
                     THEN (len(lines) - len(list_distinct(lines)))
                          * 1.0 / len(lines) ELSE 0.0 END, 6) AS dup
        FROM x
    )
    SELECT doc_id,
           CAST(ntok AS BIGINT) AS n_words,
           round(mwl, 6) AS mean_word_len,
           sym AS symbol_ratio,
           alpha AS alpha_fraction,
           CAST(kinds AS BIGINT) AS n_stop_kinds,
           (ntok >= 50 AND ntok <= 100000) AS rule_word_count,
           (mwl >= 3.0 AND mwl <= 10.0) AS rule_mean_word_len,
           (sym <= 0.1) AS rule_symbol_ratio,
           (alpha >= 0.8) AS rule_alpha_words,
           (kinds >= 2) AS rule_stop_words,
           (ell <= 0.3) AS rule_ellipsis_lines,
           (bullet <= 0.9) AS rule_bullet_lines,
           (dup <= 0.3) AS rule_dup_lines,
           ((ntok >= 50 AND ntok <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
            AND sym <= 0.1 AND alpha >= 0.8 AND kinds >= 2
            AND ell <= 0.3 AND bullet <= 0.9 AND dup <= 0.3) AS passes
    FROM y
    """,
    "Gopher rule-based quality filter (Rae et al. 2021 A1; "
    "operators.corpus.gopher_flags): word-count bounds, mean-word-"
    "length bounds, symbol ratio, alphabetic-word fraction, distinct-"
    "stopword floor, and the line-shape rules (ellipsis/bullet/"
    "duplicate lines) — each rule its own boolean column plus the "
    "conjunction, one zero-exchange JVM projection over a single "
    "tokenization, every metric and verdict hash-verified",
)
def q67_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import gopher_flags

    return gopher_flags(_t(spark, sf_dir, "documents"))


def _lang_sql_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in TX.LANG_STOPWORDS[lang]) + "]"


@_q(
    "q68_langid_multilang",
    f"""
    WITH x AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
        FROM documents
    ), y AS (
        SELECT doc_id,
               round(len(list_filter(toks, t -> list_contains({_lang_sql_list('en')}, t)))
                   * 1.0 / greatest(len(toks), 1), 6) AS en_score,
               round(len(list_filter(toks, t -> list_contains({_lang_sql_list('es')}, t)))
                   * 1.0 / greatest(len(toks), 1), 6) AS es_score,
               round(len(list_filter(toks, t -> list_contains({_lang_sql_list('fr')}, t)))
                   * 1.0 / greatest(len(toks), 1), 6) AS fr_score,
               round(len(list_filter(toks, t -> list_contains({_lang_sql_list('de')}, t)))
                   * 1.0 / greatest(len(toks), 1), 6) AS de_score
        FROM x
    )
    SELECT doc_id, en_score, es_score, fr_score, de_score,
           CASE WHEN en_score IS NULL THEN NULL
                WHEN greatest(en_score, es_score, fr_score, de_score) = 0.0 THEN 'und'
                WHEN en_score = greatest(en_score, es_score, fr_score, de_score) THEN 'en'
                WHEN es_score = greatest(en_score, es_score, fr_score, de_score) THEN 'es'
                WHEN fr_score = greatest(en_score, es_score, fr_score, de_score) THEN 'fr'
                ELSE 'de' END AS pred_lang
    FROM y
    """,
    "Multilingual heuristic language-ID "
    "(functions.text.langid_scores): per-language function-word hit "
    "ratios (en/es/fr/de) with an argmax prediction over the ROUNDED "
    "scores (profile-order tie-break, 'und' when all zero) — one "
    "zero-exchange projection over a single tokenization, every score "
    "and the prediction hash-verified",
)
def q68_langid_multilang(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = TX.langid_scores("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        s["en"].alias("en_score"),
        s["es"].alias("es_score"),
        s["fr"].alias("fr_score"),
        s["de"].alias("de_score"),
        s["pred"].alias("pred_lang"),
    )


@_q(
    "q69_collocations",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    uni AS (SELECT unnest(toks) AS w FROM tok),
    ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    big AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
    ),
    bcnt AS (
        SELECT w1, w2, count(*) AS pair_count FROM big GROUP BY w1, w2
        HAVING count(*) >= 5
    ),
    tot AS (
        SELECT (SELECT sum(c) FROM ucnt) AS m_total,
               (SELECT count(*) FROM big) AS n_total
    )
    SELECT w1, w2, CAST(b.pair_count AS BIGINT) AS pair_count,
           round((b.pair_count * 1.0 / n_total)
                 / ((u1.c * 1.0 / m_total) * (u2.c * 1.0 / m_total)), 6) AS lift
    FROM bcnt b
    JOIN ucnt u1 ON b.w1 = u1.w
    JOIN ucnt u2 ON b.w2 = u2.w
    CROSS JOIN tot
    ORDER BY lift DESC, w1, w2
    LIMIT 25
    """,
    "Corpus collocation mining (operators.profile.collocations): "
    "top-25 adjacent-token bigrams by PMI lift (= 2^PMI — log-free so "
    "the score is a fixed-order IEEE multiply/divide chain, "
    "bit-identical cross-engine). Two map-side-combined aggregations, "
    "unhinted vocabulary joins (AQE broadcasts when small), 1-row "
    "totals crossed in as broadcasts; ranked by ROUNDED lift with a "
    "(w1, w2) tie-break so the LIMIT is deterministic",
)
def q69_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.profile import collocations

    return collocations(_t(spark, sf_dir, "documents"))


@_q(
    "q70_bm25_search",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    lens AS (SELECT doc_id, len(toks) AS dl FROM tok),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    tf AS (
        SELECT doc_id, w, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS w FROM tok)
        WHERE w IN ('table', 'vector', 'spark')
        GROUP BY doc_id, w
    ),
    dft AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    sc AS (
        SELECT t.doc_id,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                 * (t.tf * (1.2 + 1))
                 / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / avgdl)) AS s
        FROM tf t
        JOIN lens l USING (doc_id)
        JOIN dft USING (w)
        CROSS JOIN stats
    )
    SELECT doc_id, round(sum(s), 6) AS bm25,
           CAST(count(*) AS BIGINT) AS n_terms_matched
    FROM sc GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    "Okapi BM25 full-text search (operators.search.bm25_search) for "
    "the query {table, vector, spark}: the corpus explode is filtered "
    "to query terms BEFORE any shuffle (postings volume, never the "
    "token stream), document lengths and (N, avgdl) are single "
    "aggregations crossed in as broadcasts, idf/tf-saturation per the "
    "published formula with identical literal arithmetic on both "
    "engines; ranked by ROUNDED score + id tie-break",
)
def q70_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.search import bm25_search

    return bm25_search(
        _t(spark, sf_dir, "documents"), query_terms=("table", "vector", "spark")
    )


_EPOCH_U = "(" + _md5h60_sql("'epoch-v1:' || doc_id::VARCHAR") + ") / 1152921504606846976.0"


@_q(
    "q71_epoch_upsample",
    f"""
    WITH x AS (
        SELECT doc_id, lang,
               ({_EPOCH_U}) AS u,
               CASE lang WHEN 'en' THEN 1.5 WHEN 'zh' THEN 2.25
                         ELSE 0.5 END AS w
        FROM documents
    ), y AS (
        SELECT doc_id, lang,
               CAST(floor(w) AS INT)
                 + (CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END) AS n
        FROM x
    )
    SELECT doc_id, lang, CAST(e AS INT) AS epoch
    FROM y, LATERAL (SELECT unnest(range(0, n)) AS e)
    """,
    "Deterministic epoch-weighted training-mixture replication "
    "(operators.corpus.epoch_upsample): 1.5 epochs of 'en', 2.25 of "
    "'zh', 0.5 elsewhere — integer replicas for every document plus a "
    "content-addressed (portable md5) fraction for one more, each row "
    "tagged with its 0-based epoch index. Zero-shuffle map + explode "
    "fan-out, no RNG state, membership identical across engines/runs/"
    "partitionings; replica counts hash-verified",
)
def q71_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import epoch_upsample

    return epoch_upsample(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        strata_col="lang",
        weights={"en": 1.5, "zh": 2.25},
        key_col="doc_id",
        default_weight=0.5,
    )


@_q(
    "q72_time_gapfill",
    """
    WITH b AS (
        SELECT event_type AS grp, date_trunc('hour', ts) AS bucket_ts,
               CAST(round(value * 100) AS BIGINT) AS vi
        FROM events
    ),
    agg AS (
        SELECT grp, bucket_ts, count(*) AS n_events,
               ((2 * sum(vi) * 10000 + count(*)) // (2 * count(*)))
                   / 1000000.0 AS avg_value
        FROM b GROUP BY grp, bucket_ts
    ),
    bounds AS (SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM b),
    spine AS (
        SELECT t.grp, g.bucket_ts
        FROM (SELECT DISTINCT grp FROM b) t
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
            FROM bounds
        ) g
    ),
    j AS (
        SELECT s.grp, s.bucket_ts,
               coalesce(a.n_events, 0) AS n_events, a.avg_value
        FROM spine s LEFT JOIN agg a USING (grp, bucket_ts)
    )
    SELECT grp AS event_type, bucket_ts,
           CAST(n_events AS BIGINT) AS n_events, avg_value,
           last_value(avg_value IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf,
           (avg_value IS NULL) AS gap_filled
    FROM j
    """,
    "Hypertable rollup with gap filling (operators.timeseries."
    "time_bucket_gapfill — the TimescaleDB time_bucket_gapfill/locf "
    "semantics): dense hourly spine per event type over the global "
    "span, empty buckets restored with n_events=0 and LOCF of the "
    "exact micro-unit bucket mean (q78's integer construction) (NULL before a series' first observation). "
    "One map-side-combined rollup shuffle; the spine costs output "
    "size (1-row bounds broadcast exploded per group), not event "
    "count; counts, means, carried values, and gap markers all "
    "hash-verified",
)
def q72_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import time_bucket_gapfill

    return time_bucket_gapfill(_t(spark, sf_dir, "events"))


@_q(
    "q73_data_quality",
    """
    WITH m AS (
        SELECT
            round(coalesce(sum(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END), 0)
                  * 1.0 / greatest(count(*), 1), 6) AS m0,
            round(count(DISTINCT (l_orderkey, l_linenumber))
                  * 1.0 / greatest(count(*), 1), 6) AS m1,
            round(coalesce(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END), 0)
                  * 1.0 / greatest(count(*), 1), 6) AS m2,
            round(coalesce(sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.08 THEN 1 ELSE 0 END), 0)
                  * 1.0 / greatest(count(*), 1), 6) AS m3,
            round(coalesce(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END), 0)
                  * 1.0 / greatest(count(*), 1), 6) AS m4
        FROM lineitem
    ), u AS (
        SELECT 'completeness(l_orderkey)' AS "check", m0 AS observed,
               CAST(1.0 AS DOUBLE) AS threshold FROM m
        UNION ALL
        SELECT 'uniqueness(l_orderkey,l_linenumber)', m1, 1.0 FROM m
        UNION ALL
        SELECT 'in_range(l_quantity,1,50)', m2, 1.0 FROM m
        UNION ALL
        SELECT 'in_range(l_discount,0.0,0.08)', m3, 0.95 FROM m
        UNION ALL
        SELECT 'accepted_values(l_returnflag)', m4, 1.0 FROM m
    )
    SELECT "check", observed, threshold, observed >= threshold AS passed FROM u
    """,
    "Declarative data-quality expectations "
    "(operators.expectations.check_expectations, the Deequ-style "
    "post-load gate): completeness, composite-key uniqueness, value "
    "ranges, and accepted sets over lineitem — ALL checks in ONE "
    "map-side-combined aggregation pass (one table scan for the whole "
    "suite), unpivoted to one row per check by a JVM stack. Exact "
    "integer-ratio metrics rounded to 6; the l_discount range check "
    "is calibrated to FAIL so both verdict branches are exercised",
)
def q73_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import (
        accepted_values,
        check_expectations,
        completeness,
        in_range,
        uniqueness,
    )

    return check_expectations(
        _t(spark, sf_dir, "lineitem"),
        [
            completeness("l_orderkey"),
            uniqueness(["l_orderkey", "l_linenumber"]),
            in_range("l_quantity", 1, 50),
            in_range("l_discount", 0.0, 0.08, threshold=0.95),
            accepted_values("l_returnflag", ("A", "N", "R")),
        ],
    )


@_q(
    "q74_funnel",
    """
    WITH u AS (
        SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'click' AND e.ts > u.t1
                   THEN e.ts END) AS t2
        FROM events e JOIN u ON e.user_id = u.user_id GROUP BY e.user_id
    ),
    w AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > v.t2
                   THEN e.ts END) AS t3
        FROM events e JOIN v ON e.user_id = v.user_id GROUP BY e.user_id
    ),
    pu AS (
        SELECT u.user_id,
               CASE WHEN u.t1 IS NULL THEN 0 WHEN v.t2 IS NULL THEN 1
                    WHEN w.t3 IS NULL THEN 2 ELSE 3 END AS sc
        FROM u JOIN v ON u.user_id = v.user_id JOIN w ON u.user_id = w.user_id
    ),
    spine AS (SELECT unnest([1, 2, 3]) AS step,
                     unnest(['signup', 'click', 'purchase']) AS step_name)
    SELECT step, step_name,
           CAST(coalesce(sum(CASE WHEN pu.sc >= step THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS users
    FROM spine LEFT JOIN pu ON TRUE GROUP BY step, step_name
    """,
    "Ordered funnel analysis signup→click→purchase "
    "(operators.events.funnel_report): each step requires an event "
    "STRICTLY later than the previous step's completion. Spark walks "
    "each user's time-sorted events with a JVM higher-order fold (ONE "
    "shuffle — per-user lists are the sharding unit at 100 TB); the "
    "oracle computes the same semantics as chained conditional-min "
    "aggregations — the two formulations pinned hash-equal. Every "
    "step appears in the report even at zero survivors",
)
def q74_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import funnel_report

    return funnel_report(
        _t(spark, sf_dir, "events"), steps=("signup", "click", "purchase")
    )


@_q(
    "q75_retention",
    """
    WITH p AS (SELECT user_id, date_trunc('week', ts) AS pp FROM events),
    f AS (SELECT user_id, min(pp) AS cohort FROM p GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, pp FROM p)
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort::DATE, a.pp::DATE) // 7 AS INT)
               AS period_offset,
           CAST(count(*) AS BIGINT) AS users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY f.cohort, period_offset
    """,
    "Weekly cohort retention matrix (operators.events."
    "retention_matrix): users cohorted by first-activity week "
    "(Monday-truncated on both engines), each cell counting cohort "
    "members active again N weeks later (offset 0 = cohort size). "
    "Two map-side-combined aggregations joined on the user key; "
    "offsets are exact integer day arithmetic",
)
def q75_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import retention_matrix

    return retention_matrix(_t(spark, sf_dir, "events"))


@_q(
    "q76_event_transitions",
    """
    WITH s AS (
        SELECT lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS from_type,
               event_type AS to_type
        FROM events
    )
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS transitions
    FROM s WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    "First-order event transition matrix "
    "(operators.events.event_transitions — the Sankey/paths view): "
    "lag over each user's (ts, event_id)-ordered stream (id tie-break "
    "for cross-engine same-timestamp determinism), then one map-side-"
    "combined count on the (from, to) pair; single user-keyed "
    "exchange, no self-join, no explode",
)
def q76_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


@_q(
    "q77_pagerank",
    """
    WITH e AS (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                        's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    n AS (SELECT count(*) AS cnt FROM nodes),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 / cnt AS rank FROM nodes CROSS JOIN n),
    c1 AS (SELECT e.dst AS node, sum(r.rank / deg.d) AS contrib
           FROM e JOIN r0 r ON e.src = r.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r1 AS (SELECT nodes.node,
                  (1 - 0.85) / cnt + 0.85 * coalesce(c1.contrib, 0) AS rank
           FROM nodes CROSS JOIN n LEFT JOIN c1 ON nodes.node = c1.node),
    c2 AS (SELECT e.dst AS node, sum(r.rank / deg.d) AS contrib
           FROM e JOIN r1 r ON e.src = r.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r2 AS (SELECT nodes.node,
                  (1 - 0.85) / cnt + 0.85 * coalesce(c2.contrib, 0) AS rank
           FROM nodes CROSS JOIN n LEFT JOIN c2 ON nodes.node = c2.node),
    c3 AS (SELECT e.dst AS node, sum(r.rank / deg.d) AS contrib
           FROM e JOIN r2 r ON e.src = r.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r3 AS (SELECT nodes.node,
                  (1 - 0.85) / cnt + 0.85 * coalesce(c3.contrib, 0) AS rank
           FROM nodes CROSS JOIN n LEFT JOIN c3 ON nodes.node = c3.node)
    SELECT node, round(rank, 9) AS rank FROM r3
    """,
    "PageRank, 3 synchronous iterations over the customer→supplier "
    "order graph (operators.graph.pagerank — the canonical iterative "
    "Spark workload beside q48's connected components): per round one "
    "edges⋈ranks join on the source key + one map-side-combined "
    "destination sum, rank table never exceeds |V|, dangling mass "
    "deliberately not redistributed (documented variant). The oracle "
    "UNROLLS the identical recurrence as chained CTEs with matching "
    "literal arithmetic — loop and unrolled formulations pinned "
    "hash-equal",
)
def q77_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return pagerank(edges, iterations=3)


@_q(
    "q78_rolling_anomalies",
    """
    WITH b AS (
        SELECT event_type AS grp, date_trunc('hour', ts) AS bucket_ts,
               CAST(round(value * 100) AS BIGINT) AS vi
        FROM events
    ),
    agg AS (
        SELECT grp, bucket_ts, sum(vi) AS sb, sum(vi * vi) AS sq,
               count(*) AS m
        FROM b GROUP BY grp, bucket_ts
    ),
    st AS (
        SELECT grp, bucket_ts, sb, m,
               sum(sb) OVER tw AS s1, sum(sq) OVER tw AS s2,
               sum(m) OVER tw AS ne, count(sb) OVER tw AS nb
        FROM agg
        WINDOW tw AS (PARTITION BY grp ORDER BY bucket_ts
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    x AS (
        SELECT grp, bucket_ts, nb,
               ((2 * sb * 10000 + m) // (2 * m)) / 1000000.0 AS avg_value,
               CASE WHEN ne > 0 THEN
                   ((2 * s1 * 10000 + ne) // (2 * ne)) / 1000000.0
               END AS roll_mean,
               CASE WHEN ne >= 2 THEN
                   round(sqrt((CAST(ne AS DOUBLE) * CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                              / (10000.0 * ne * (ne - 1))), 6)
               END AS roll_std
        FROM st
    )
    SELECT grp AS event_type, bucket_ts, avg_value, roll_mean, roll_std,
           (nb >= 12 AND roll_std > 0.0
            AND abs(avg_value - roll_mean) > 3.0 * roll_std) AS is_anomaly
    FROM x
    """,
    "Rolling z-score anomaly detection "
    "(operators.timeseries.rolling_anomalies): hourly bucket means "
    "per event type flagged when they deviate >3 sample standard "
    "deviations from the trailing-24-bucket event distribution "
    "(window EXCLUDES the current bucket; <12 trailing buckets never "
    "flags). Deterministic BY CONSTRUCTION: fixed-point values lift "
    "to exact integers, means are integer half-up divisions to "
    "micro-units, variance is one division of exact integers, sqrt "
    "is IEEE-correctly-rounded — bit-identical moments and verdicts "
    "on every engine (naive round(avg(...),6) measured 17-22/3385 "
    "cross-engine flips on this data: means of 2-decimal values sit "
    "exactly on decimal half-boundaries)",
)
def q78_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import rolling_anomalies

    return rolling_anomalies(_t(spark, sf_dir, "events"))


@_q(
    "q79_funnel_windowed",
    """
    WITH u AS (
        SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'click' AND e.ts > u.t1
                        AND epoch_us(e.ts) - epoch_us(u.t1) <= 604800000000
                   THEN e.ts END) AS t2,
               min(u.t1) AS t1
        FROM events e JOIN u ON e.user_id = u.user_id GROUP BY e.user_id
    ),
    w AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > v.t2
                        AND epoch_us(e.ts) - epoch_us(v.t1) <= 604800000000
                   THEN e.ts END) AS t3
        FROM events e JOIN v ON e.user_id = v.user_id GROUP BY e.user_id
    ),
    pu AS (
        SELECT u.user_id,
               CASE WHEN u.t1 IS NULL THEN 0 WHEN v.t2 IS NULL THEN 1
                    WHEN w.t3 IS NULL THEN 2 ELSE 3 END AS sc
        FROM u JOIN v ON u.user_id = v.user_id JOIN w ON u.user_id = w.user_id
    ),
    spine AS (SELECT unnest([1, 2, 3]) AS step,
                     unnest(['signup', 'click', 'purchase']) AS step_name)
    SELECT step, step_name,
           CAST(coalesce(sum(CASE WHEN pu.sc >= step THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS users
    FROM spine LEFT JOIN pu ON TRUE GROUP BY step, step_name
    """,
    "Conversion-window funnel (operators.events.funnel_report with "
    "conversion_window_days=7): each later step must land within 7 "
    "days of the step-1 completion, checked in exact microseconds so "
    "both engines compare integers. Same walk-vs-chained-min dual "
    "derivation as q74, pinned hash-equal",
)
def q79_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import funnel_report

    return funnel_report(
        _t(spark, sf_dir, "events"),
        steps=("signup", "click", "purchase"),
        conversion_window_days=7,
    )


_CMS_PROBES = ("table", "scan", "vector", "spark", "zzz_absent")
_CMS_CELL = lambda row: (  # noqa: E731 — md5h60('cms-r<row>:' || item) % 1024
    "(" + _md5h60_sql(f"'cms-r{row}:' || item") + ") % 1024"
)


@_q(
    "q80_countmin_sketch",
    f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(text, '\\s+')) AS item
        FROM documents
    ),
    cells AS (
        SELECT 0 AS row, ({_CMS_CELL(0)}) AS col FROM toks UNION ALL
        SELECT 1, ({_CMS_CELL(1)}) FROM toks UNION ALL
        SELECT 2, ({_CMS_CELL(2)}) FROM toks UNION ALL
        SELECT 3, ({_CMS_CELL(3)}) FROM toks
    ),
    sk AS (SELECT row, col, count(*) AS cnt FROM cells GROUP BY row, col),
    probes AS (SELECT unnest({list(_CMS_PROBES)}) AS item),
    lk AS (
        SELECT p.item, r.row,
               ({_md5h60_sql("'cms-r' || CAST(r.row AS VARCHAR) || ':' || p.item")})
                   % 1024 AS col
        FROM probes p CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS row) r
    ),
    est AS (
        SELECT lk.item, min(coalesce(sk.cnt, 0)) AS est
        FROM lk LEFT JOIN sk ON lk.row = sk.row AND lk.col = sk.col
        GROUP BY lk.item
    ),
    exact AS (
        SELECT item, count(*) AS exact FROM toks
        WHERE list_contains({list(_CMS_PROBES)}, item) GROUP BY item
    )
    SELECT e.item, CAST(e.est AS BIGINT) AS est,
           CAST(coalesce(x.exact, 0) AS BIGINT) AS exact,
           (e.est >= coalesce(x.exact, 0)) AS overcount_ok
    FROM est e LEFT JOIN exact x ON e.item = x.item
    """,
    "Count-Min sketch heavy-hitter estimation "
    "(operators.sketches.count_min_sketch/cms_estimate, Cormode & "
    "Muthukrishnan): 4x1024 sketch built with the portable md5 hash "
    "family so the SKETCH CONTENTS are bit-identical cross-engine, "
    "not just the estimates; probe tokens (incl. one absent) "
    "estimated by min-over-rows against exact counts with the "
    "never-undercount invariant as a verified column. Sketch size is "
    "d*w regardless of vocabulary — the mergeable shape exact counts "
    "cannot offer at 100 TB",
)
def q80_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    items = _t(spark, sf_dir, "documents").select(
        F.explode(TX.tokens("text")).alias("item")
    )
    sketch = count_min_sketch(items)
    probes = spark.createDataFrame([(t,) for t in _CMS_PROBES], "item string")
    est = cms_estimate(sketch, probes)
    exact = (
        items.where(F.col("item").isin(*_CMS_PROBES))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return est.join(exact, "item", "left").select(
        "item",
        F.col("est").cast("long").alias("est"),
        F.coalesce(F.col("exact"), F.lit(0)).cast("long").alias("exact"),
        (F.col("est") >= F.coalesce(F.col("exact"), F.lit(0))).alias("overcount_ok"),
    )


@_q(
    "q81_scd2_intervals",
    """
    WITH c AS (
        SELECT user_id, ts, event_id, event_type AS value,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    ch AS (
        SELECT user_id, ts, event_id, value FROM c
        WHERE prev IS NULL OR value != prev
    )
    SELECT user_id, value, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM ch
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "SCD Type-2 temporal history from the event stream "
    "(operators.events.scd2_intervals): each attribute CHANGE opens a "
    "validity interval closed by the next change (NULL valid_to on "
    "the current row; consecutive same-value events collapse). Two "
    "windows over one (entity, ts, id) ordering — one user-keyed "
    "shuffle, change-filter map-side between them, id tie-break for "
    "same-timestamp determinism. Pairs with the as-of join (q35) for "
    "point-in-time lookups",
)
def q81_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import scd2_intervals

    return scd2_intervals(_t(spark, sf_dir, "events"))


@_q(
    "q82_point_in_time",
    """
    WITH c AS (
        SELECT user_id, ts, event_id, event_type AS value,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    ch AS (
        SELECT user_id, ts, event_id, value FROM c
        WHERE prev IS NULL OR value != prev
    ),
    iv AS (
        SELECT user_id, value, ts AS valid_from, lead(ts) OVER w AS valid_to
        FROM ch
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, value AS state_at_t, valid_from
    FROM iv
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
    """,
    "Point-in-time lookup over the SCD2 history "
    "(operators.events.scd2_intervals + interval-containment filter): "
    "every entity's tracked state as of 2024-01-15 — the query "
    "temporal tables exist for, composing q81's intervals with a "
    "containment predicate (at most one interval matches per entity "
    "by construction). Same single user-keyed shuffle as q81; the "
    "containment filter is map-side",
)
def q82_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import scd2_intervals

    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    iv = scd2_intervals(_t(spark, sf_dir, "events"))
    return iv.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", F.col("value").alias("state_at_t"), "valid_from")


@_q(
    "q83_histogram",
    """
    WITH s AS (
        SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        FROM lineitem
    ),
    b AS (
        SELECT CASE WHEN hi = lo THEN 0
                    ELSE least(CAST(floor((l_extendedprice - lo)
                                    / ((hi - lo) / 20.0)) AS INT), 19)
               END AS bucket,
               l_extendedprice AS v
        FROM lineitem CROSS JOIN s
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n, round(sum(v), 2) AS total
    FROM b GROUP BY bucket
    """,
    "Equi-width numeric histogram (20 buckets over the observed "
    "[min, max] of l_extendedprice): the profiling staple — one "
    "1-row bounds aggregation broadcast-crossed into a map-side "
    "bucket assignment, then one map-side-combined count/sum. Bucket "
    "edges are the same textual IEEE expression on both engines, so "
    "edge-adjacent values bucket identically; the top edge closes "
    "via least(..., 19). A degenerate column (hi = lo, zero width) "
    "would otherwise divide 0/0 — NaN, where DuckDB errors on the "
    "INT cast and Spark silently buckets — so both sides branch to "
    "bucket 0 explicitly",
)
def q83_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import histogram

    return histogram(_t(spark, sf_dir, "lineitem"), "l_extendedprice", buckets=20)


@_q(
    "q84_fuzzy_match",
    """
    WITH n AS (
        SELECT DISTINCT p_name AS name,
               regexp_split_to_array(p_name, '\\s+')[-1] AS blk
        FROM part
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS distance
    FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 2
    """,
    "Entity-resolution fuzzy match (operators.dedup.fuzzy_match_pairs "
    "— the typo/variant-spelling dedup tier): distinct part names "
    "paired within last-word blocks and kept at Levenshtein distance "
    "<= 2. The pair join runs over the DISTINCT-name vocabulary "
    "(orders of magnitude under the record count) and only within "
    "blocks; Levenshtein has identical unit-cost semantics on both "
    "engines so distances hash-match",
)
def q84_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.dedup import fuzzy_match_pairs

    return fuzzy_match_pairs(
        _t(spark, sf_dir, "part"), name_col="p_name", max_distance=2
    ).select("name_a", "name_b", F.col("distance").cast("int").alias("distance"))


@_q(
    "q85_funnel_capped",
    """
    WITH ce AS (
        SELECT user_id, ts, event_type
        FROM (SELECT user_id, ts, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_type) AS rn
              FROM events)
        WHERE rn <= 10
    ),
    u AS (
        SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        FROM ce GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'click' AND e.ts > u.t1
                   THEN e.ts END) AS t2
        FROM ce e JOIN u ON e.user_id = u.user_id GROUP BY e.user_id
    ),
    w AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > v.t2
                   THEN e.ts END) AS t3
        FROM ce e JOIN v ON e.user_id = v.user_id GROUP BY e.user_id
    ),
    pu AS (
        SELECT u.user_id,
               CASE WHEN u.t1 IS NULL THEN 0 WHEN v.t2 IS NULL THEN 1
                    WHEN w.t3 IS NULL THEN 2 ELSE 3 END AS sc
        FROM u JOIN v ON u.user_id = v.user_id JOIN w ON u.user_id = w.user_id
    ),
    spine AS (SELECT unnest([1, 2, 3]) AS step,
                     unnest(['signup', 'click', 'purchase']) AS step_name)
    SELECT step, step_name,
           CAST(coalesce(sum(CASE WHEN pu.sc >= step THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS users
    FROM spine LEFT JOIN pu ON TRUE GROUP BY step, step_name
    """,
    "q74's ordered funnel with the bot-user skew cap "
    "(max_events_per_user=10): each user's EARLIEST 10 events by "
    "(ts, type) — a streaming row_number rank BEFORE the per-user "
    "collect, so no task ever materializes a pathological user's "
    "full event array at 100 TB. The rank shares the collect's "
    "user-keyed exchange (still one shuffle, plan-pinned); the "
    "oracle mirrors the cap as the identical row_number() <= 10 "
    "filter feeding q74's chained conditional-min formulation",
)
def q85_funnel_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import funnel_report

    return funnel_report(
        _t(spark, sf_dir, "events"),
        steps=("signup", "click", "purchase"),
        max_events_per_user=10,
    )


@_q(
    "q86_entity_resolution",
    """
    WITH RECURSIVE n AS (
        SELECT DISTINCT p_name AS name,
               regexp_split_to_array(p_name, '\\s+')[-1] AS blk
        FROM part
    ),
    pairs AS (
        SELECT a.name AS name_a, b.name AS name_b
        FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 2
    ),
    edges AS (
        SELECT name_a AS src, name_b AS dst FROM pairs
        UNION
        SELECT name_b, name_a FROM pairs
    ),
    reach AS (
        SELECT src AS node, src AS lab FROM edges
        UNION
        SELECT e.src AS node, r.lab
        FROM edges e JOIN reach r ON e.dst = r.node
    ),
    cl AS (SELECT node, min(lab) AS cluster FROM reach GROUP BY node)
    SELECT n.name, coalesce(cl.cluster, n.name) AS canonical
    FROM n LEFT JOIN cl ON n.name = cl.node
    """,
    "Entity resolution end-to-end (operators.dedup.resolve_entities): "
    "fuzzy-match pairs within last-word blocks → connected components "
    "(pointer-jump label propagation) → canonical spelling = the "
    "lexicographically smallest variant of each cluster; unclustered "
    "names map to themselves, so the result is a TOTAL resolution map "
    "over the distinct-name vocabulary. Oracle = the same chain with "
    "a recursive-CTE min-reachable-label in place of the loop. Every "
    "stage is vocabulary-sized; records only join the finished map",
)
def q86_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.dedup import resolve_entities

    return resolve_entities(_t(spark, sf_dir, "part"), name_col="p_name")


@_q(
    "q87_triangle_count",
    """
    WITH e AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    deg AS (
        SELECT n, count(*) AS d
        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n
    ),
    oriented AS (
        SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS u,
               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS v,
               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d END AS dv
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
    ),
    wedges AS (
        SELECT o1.v AS x, o2.v AS y
        FROM oriented o1 JOIN oriented o2
          ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT n FROM (SELECT a AS n FROM e
                                          UNION ALL SELECT b FROM e))) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM wedges w JOIN oriented o ON w.x = o.u AND w.y = o.v)
               AS n_triangles
    """,
    "Global triangle count over the part co-purchase graph (parts "
    "sharing an order; operators.graph.triangle_count): degree-"
    "ordered edge orientation — each triangle counted once from its "
    "lowest-rank apex, wedge volume Σ out-deg² with out-degree "
    "bounded O(√m) by the orientation even on power-law graphs. "
    "Exact, so the oracle runs the identical algorithm; rank ties "
    "break by node id, deterministic cross-engine",
)
def q87_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # co-purchase pairs via ONE groupBy + a map-side pair explode —
    # a lineitem⋈lineitem self-join on the order key shuffles the
    # fact table twice for the same result
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )
    return triangle_count(edges)


_BLOOM_BITS = 131_072
_BLOOM_K = 5


def _bloom_bit_sql(h: str, item: str) -> str:
    """DuckDB mirror of operators.sketches._bloom_bit."""
    return (
        "("
        + _md5h60_sql(f"'bloom-h' || CAST({h} AS VARCHAR) || ':' || {item}")
        + f") % {_BLOOM_BITS}"
    )


@_q(
    "q88_bloom_membership",
    f"""
    WITH members AS (SELECT DISTINCT c_name AS item FROM customer),
    hs AS (SELECT unnest([0, 1, 2, 3, 4]) AS h),
    bits AS (
        SELECT DISTINCT {_bloom_bit_sql('h', 'item')} AS bit
        FROM members CROSS JOIN hs
    ),
    probes AS (
        SELECT DISTINCT item FROM (
            SELECT c_name AS item FROM customer WHERE c_custkey % 50 = 0
            UNION ALL
            SELECT 'absent-' || n_name FROM nation
        )
    ),
    lk AS (
        SELECT item, {_bloom_bit_sql('h', 'item')} AS bit
        FROM probes CROSS JOIN hs
    ),
    hit AS (
        SELECT lk.item, count(bits.bit) AS nhit
        FROM lk LEFT JOIN bits ON lk.bit = bits.bit
        GROUP BY lk.item
    )
    SELECT h.item, h.nhit = {_BLOOM_K} AS might_contain,
           m.item IS NOT NULL AS is_member
    FROM hit h LEFT JOIN members m ON h.item = m.item
    """,
    "Bloom-filter membership (operators.sketches.bloom_build / "
    "bloom_might_contain): the customer-name set sketched into "
    f"{_BLOOM_BITS} bits with {_BLOOM_K} portable md5 hashes, probed "
    "with a mix of present names and absent synthetics, alongside "
    "exact membership (no false negatives by construction; false "
    "positives at the sized rate — both engines compute identical "
    "bit positions, so the answer including any FP hash-matches). "
    "The 100 TB use: broadcast the ≤ n_bits-row filter to prune a "
    "fact scan BEFORE its shuffle",
)
def q88_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    cust = _t(spark, sf_dir, "customer")
    members = cust.select(F.col("c_name").alias("item"))
    bloom = bloom_build(members, n_bits=_BLOOM_BITS, n_hashes=_BLOOM_K)
    probes = (
        cust.where(F.col("c_custkey") % 50 == 0)
        .select(F.col("c_name").alias("item"))
        .union(
            _t(spark, sf_dir, "nation").select(
                F.concat(F.lit("absent-"), F.col("n_name")).alias("item")
            )
        )
    )
    out = bloom_might_contain(
        probes, bloom, n_bits=_BLOOM_BITS, n_hashes=_BLOOM_K
    )
    mem = members.distinct().withColumn("__m", F.lit(1))
    return out.join(mem, ["item"], "left").select(
        "item", "might_contain", F.col("__m").isNotNull().alias("is_member")
    )


def _hll_num_literal(p: int = 6) -> float:
    from dataflow_python_etl_spark.operators.sketches import _hll_alpha

    m = 1 << p
    return _hll_alpha(m) * m * m * float(2 ** (61 - p))


@_q(
    "q89_hll_distinct",
    f"""
    WITH src AS (
        SELECT l_linenumber AS grp, CAST(l_orderkey AS VARCHAR) AS item
        FROM lineitem
    ),
    hashed AS (
        SELECT grp, ({_md5h60_sql('item')}) AS h FROM src
    ),
    regs AS (
        SELECT grp, h % 64 AS bucket,
               max(CASE WHEN h // 64 = 0 THEN 55
                        ELSE 55 - length(bin(h // 64)) END) AS rho
        FROM hashed GROUP BY grp, h % 64
    ),
    est AS (
        SELECT grp,
               round({_hll_num_literal(6)!r} /
                     (sum(CAST(power(2.0, 55 - rho) AS BIGINT))
                      + (64 - count(*)) * {2 ** 55}), 3) AS est
        FROM regs GROUP BY grp
    ),
    exact AS (
        SELECT grp, CAST(count(DISTINCT item) AS BIGINT) AS exact
        FROM src GROUP BY grp
    )
    SELECT est.grp, est.est, exact.exact
    FROM est JOIN exact ON est.grp = exact.grp
    """,
    "HyperLogLog distinct estimate vs exact — distinct orders per "
    "line number (operators.sketches.hll_registers / hll_estimate): "
    "64 registers per group regardless of cardinality, built on the "
    "portable md5 hash with integer bit math (bin-string leading "
    "zeros, no clz intrinsic) so register CONTENTS are engine-"
    "identical; the estimate is exact-integer register terms "
    "2^(T-rho) summed in int64 + ONE double division by the literal "
    "numerator — the same no-float-summation construction as the "
    "rolling-anomaly moments (no small-range ln branch: engine-"
    "private libm ulps; cardinalities here sit in the raw regime). "
    "The sketch shape that survives streaming checkpoints and cross-"
    "shard merges at 100 TB where an exact distinct table cannot",
)
def q89_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    src = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").alias("grp"),
        F.col("l_orderkey").cast("string").alias("item"),
    )
    est = hll_estimate(hll_registers(src, "item", ("grp",), p=6), ("grp",), p=6)
    exact = src.groupBy("grp").agg(
        F.count_distinct("item").cast("long").alias("exact")
    )
    return est.join(exact, "grp").select("grp", "est", "exact")


@_q(
    "q90_readability",
    """
    WITH m AS (
        SELECT doc_id,
               greatest(len(regexp_split_to_array(text, '\\s+')), 1) AS words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
        FROM documents
    )
    SELECT doc_id, CAST(words AS BIGINT) AS words,
           CAST(sentences AS BIGINT) AS sentences,
           CAST(syllables AS BIGINT) AS syllables,
           round(206.835 - 1.015 * (words / sentences)
                 - 84.6 * (syllables / words), 3) AS flesch
    FROM m
    """,
    "Flesch reading-ease readability per document "
    "(functions.text.readability_scores — curriculum ordering / "
    "difficulty stratification signal): syllables ≈ vowel-group "
    "count, sentences = punctuation-run count floored at 1, the "
    "published formula evaluated in the same textual operation order "
    "on both engines (integer counts, two double divisions, round "
    "3). Zero-shuffle expression tree, no HOF lambdas at all",
)
def q90_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = TX.readability_scores("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        r["words"].alias("words"),
        r["sentences"].alias("sentences"),
        r["syllables"].alias("syllables"),
        r["flesch"].alias("flesch"),
    )


@_q(
    "q91_attribution",
    """
    WITH t AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                          THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS touch_type
        FROM events
    )
    SELECT coalesce(touch_type, 'none') AS touch_type,
           CAST(count(*) AS BIGINT) AS conversions,
           round(sum(value), 2) AS total_value
    FROM t WHERE event_type = 'purchase'
    GROUP BY coalesce(touch_type, 'none')
    """,
    "Last-touch conversion attribution (operators.events."
    "attribution): every purchase credited to the user's last "
    "preceding non-conversion event type — one ignorenulls window "
    "over the shared (user, ts, id) ordering (the conversion row "
    "contributes NULL so the current-row frame is safe) + one "
    "map-side-combined aggregation per touch type; 'none' bucket for "
    "conversions with no prior touch. Same single user-keyed shuffle "
    "as the funnel family; 2-decimal value sums round boundary-free",
)
def q91_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import attribution

    return attribution(_t(spark, sf_dir, "events"))


@_q(
    "q92_ab_split",
    f"""
    WITH u AS (
        SELECT user_id,
               (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                >= 14) AS converted
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT converted,
               ({_md5h60_sql("'ab-v1:' || CAST(user_id AS VARCHAR)")}) % 2 AS g
        FROM u
    ),
    s AS (
        SELECT
            CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN g = 0 AND converted THEN 1 ELSE 0 END)
                 AS BIGINT) AS conv_a,
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(sum(CASE WHEN g = 1 AND converted THEN 1 ELSE 0 END)
                 AS BIGINT) AS conv_b
        FROM g
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(CASE WHEN n_a > 0 AND n_b > 0
                       AND ((conv_a + conv_b) / (n_a + n_b))
                           * (1 - (conv_a + conv_b) / (n_a + n_b))
                           * (1.0 / n_a + 1.0 / n_b) > 0
                 THEN (conv_a / n_a - conv_b / n_b)
                      / sqrt(((conv_a + conv_b) / (n_a + n_b))
                             * (1 - (conv_a + conv_b) / (n_a + n_b))
                             * (1.0 / n_a + 1.0 / n_b))
                 ELSE 0.0 END, 6) AS z
    FROM s
    """,
    "Deterministic A/B experiment readout (operators.events."
    "ab_split_metrics): users hash-split 50/50 by portable salted "
    "md5 (no RNG — rerun-stable, salt versions the experiment), "
    "conversion = >= 14 purchases, one row with both arms and the "
    "two-proportion pooled z-score — integer counts until one fixed-"
    "order chain of IEEE divisions + a correctly-rounded sqrt, "
    "degenerate variance reads z = 0 explicitly (NaN diverges "
    "cross-engine). One user-keyed shuffle, one-row output at any "
    "scale",
)
def q92_ab_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import ab_split_metrics

    return ab_split_metrics(_t(spark, sf_dir, "events"), min_conversions=14)


@_q(
    "q93_cusum",
    """
    WITH b AS (
        SELECT event_type AS grp, date_trunc('hour', ts) AS bucket_ts
        FROM events
    ),
    agg AS (
        SELECT grp, bucket_ts, count(*) AS n_events FROM b GROUP BY grp, bucket_ts
    ),
    bounds AS (SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM b),
    spine AS (
        SELECT t.grp, g.bucket_ts
        FROM (SELECT DISTINCT grp FROM b) t
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
            FROM bounds
        ) g
    ),
    j AS (
        SELECT s.grp, s.bucket_ts, coalesce(a.n_events, 0) AS n_events
        FROM spine s LEFT JOIN agg a USING (grp, bucket_ts)
    ),
    w1 AS (
        SELECT grp, bucket_ts, n_events,
               count(*) OVER (PARTITION BY grp) AS nb,
               sum(n_events) OVER (PARTITION BY grp) AS tot
        FROM j
    ),
    w2 AS (
        SELECT *, sum(n_events * nb - tot) OVER (
                   PARTITION BY grp ORDER BY bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM w1
    ),
    w3 AS (
        SELECT *,
               p - least(0, min(p) OVER (
                   PARTITION BY grp ORDER BY bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_pos,
               greatest(0, max(p) OVER (
                   PARTITION BY grp ORDER BY bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - p AS s_neg
        FROM w2
    )
    SELECT grp AS event_type, bucket_ts, CAST(n_events AS BIGINT) AS n_events,
           round(s_pos / nb, 6) AS cusum_pos,
           round(s_neg / nb, 6) AS cusum_neg,
           (100 * s_pos > 5 * tot * nb OR 100 * s_neg > 5 * tot * nb) AS alarm
    FROM w3
    """,
    "Two-sided CUSUM change-point detection on per-type hourly event "
    "rates (operators.timeseries.cusum_change_points): the recursion "
    "max(0, S+(x−mean)) computed CLOSED-FORM as prefix-sum minus "
    "running extreme — two window passes on one group partitioning, "
    "no recursion, no per-series fold. Deviations scale to exact "
    "int64 (x·n − Σx), the alarm compares integers (cumulative "
    "deviation > 5% of series volume), and the only float op is the "
    "final one-division display scale — the fixed-point discipline "
    "applied to a drift detector that complements q78's spike "
    "z-score",
)
def q93_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import cusum_change_points

    return cusum_change_points(_t(spark, sf_dir, "events"), threshold=5)


@_q(
    "q94_event_debounce",
    """
    WITH g AS (
        SELECT event_type, ts,
               lag(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT event_type,
           CAST(sum(CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(count(*) AS BIGINT) AS total
    FROM g GROUP BY event_type
    """,
    "Telemetry debounce, session-anchored (operators.events."
    "debounce_events): per (user, type) an event is kept iff >1h has "
    "passed since the PREVIOUS event of that key — i.e. the first "
    "event of each inactivity session; repeats inside a burst are "
    "suppressed. One lag window on the shared (user, ts, id) "
    "ordering, gap compared in exact microseconds; per-type "
    "kept/total counts. (The strict rate-limit variant — anchored on "
    "the last KEPT event — is sequential by nature: "
    "debounce_events(mode='strict') folds per key, pytest-pinned "
    "against a reference implementation, no SQL twin)",
)
def q94_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import debounce_events

    kept = debounce_events(_t(spark, sf_dir, "events"), gap_seconds=3600)
    return kept.groupBy("event_type").agg(
        F.sum(F.col("kept").cast("long")).alias("kept"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )


@_q(
    "q95_winsorize",
    """
    WITH b AS (
        SELECT l_returnflag AS g,
               round(quantile_cont(l_extendedprice, 0.05), 6) AS p_lo,
               round(quantile_cont(l_extendedprice, 0.95), 6) AS p_hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT li.l_returnflag, b.p_lo, b.p_hi,
           CAST(sum(CASE WHEN l_extendedprice < p_lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN l_extendedprice > p_hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above,
           CAST(count(*) AS BIGINT) AS n_total
    FROM lineitem li JOIN b ON li.l_returnflag = b.g
    GROUP BY 1, 2, 3
    """,
    "Winsorization report per return flag (operators.expectations."
    "winsorize_bounds): exact interpolated [p05, p95] clip bounds "
    "(q34's cross-engine percentile mechanism, rounded once) "
    "broadcast back onto the column for integer tail counts — "
    "nothing accumulates float error (a clipped-value SUM would "
    "leave the exact-decimal grid; the report ships counts and lets "
    "the caller clip). The outlier-capping staple of feature "
    "cleaning",
)
def q95_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import winsorize_bounds

    return winsorize_bounds(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        lower=0.05,
        upper=0.95,
        group_col="l_returnflag",
    )


@_q(
    "q96_scd2_incremental",
    """
    WITH c AS (
        SELECT user_id, ts, event_id, event_type AS value,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    ch AS (
        SELECT user_id, ts, event_id, value FROM c
        WHERE prev IS NULL OR value != prev
    )
    SELECT user_id, value, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM ch
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "Incremental SCD2 maintenance (operators.events."
    "scd2_apply_changes): the dimension built from events BEFORE "
    "2024-01-15 has the later events applied as a CDC batch — and "
    "the oracle is the FULL-history rebuild, because the operator's "
    "contract is apply(scd2(A), B) == scd2(A ∪ B): touched entities' "
    "current rows re-enter as virtual observations ahead of their "
    "batch changes and flow through the identical interval "
    "derivation, so collapse/chain/no-op/new-entity semantics are "
    "inherited rather than re-implemented; closed history is never "
    "re-derived (per-batch cost = touched entities + batch). "
    "Out-of-order changes fail loudly (filter-anchored raise_error)",
)
def q96_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import (
        scd2_apply_changes,
        scd2_intervals,
    )

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    dim = scd2_intervals(ev.where(F.col("ts") < cutoff))
    return scd2_apply_changes(dim, ev.where(F.col("ts") >= cutoff))


@_q(
    "q97_peak_concurrency",
    """
    WITH flagged AS (
        SELECT user_id AS u, ts AS t, event_id AS i,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 300000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT u, sid, min(t) AS s_start, max(t) AS s_end
        FROM (
            SELECT *, sum(ns) OVER (PARTITION BY u ORDER BY t, i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM flagged
        ) GROUP BY u, sid
    ),
    deltas AS (
        SELECT s_start AS t, 1 AS d, u, sid FROM sess
        UNION ALL
        SELECT s_end, -1, u, sid FROM sess
    ),
    sweep AS (
        SELECT CAST(t AS DATE) AS day,
               sum(d) OVER (ORDER BY t, -d, u, sid
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS live
        FROM deltas
    )
    SELECT day, CAST(max(live) AS BIGINT) AS peak_concurrent
    FROM sweep GROUP BY day
    """,
    "Peak concurrent sessions per day (operators.events."
    "peak_concurrency — the capacity-planning readout): q32's "
    "inactivity sessionization → [start, end] endpoints → a +1/−1 "
    "sweep with a running sum, max per day. Endpoints sort "
    "(ts, −delta, user, session): sessions are CLOSED intervals — "
    "active at start and end instants, single-event sessions count "
    "themselves — the documented boundary policy both engines share. The globally-ordered sweep is inherent to exact "
    "concurrency and runs over session ENDPOINTS (2 rows/session), "
    "not events; all integer arithmetic",
)
def q97_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import peak_concurrency

    return peak_concurrency(_t(spark, sf_dir, "events"), gap_seconds=300)


@_q(
    "q98_rfm_segments",
    """
    WITH per AS (
        SELECT o_custkey AS entity, max(o_orderdate) AS last_ts,
               count(*) AS freq, round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT monetary,
               ntile(5) OVER (ORDER BY last_ts DESC, entity) AS r,
               ntile(5) OVER (ORDER BY freq DESC, entity) AS f,
               ntile(5) OVER (ORDER BY monetary DESC, entity) AS m
        FROM per
    )
    SELECT r || '-' || f || '-' || m AS segment,
           CAST(count(*) AS BIGINT) AS n_entities,
           round(sum(monetary), 2) AS total_monetary
    FROM scored GROUP BY r, f, m
    """,
    "RFM customer segmentation over orders (operators.events."
    "rfm_segments): per-customer recency/frequency/monetary profile, "
    "each metric quintiled over the whole base, reported per r-f-m "
    "cell. The quintiles are EXACT SQL NTILE but computed distributed "
    "(operators.events.global_ntile: range-repartition + within-"
    "partition rank + broadcast prefix offsets — one rangepartitioning "
    "exchange per metric, plan-pinned ReuseExchange, never Spark's "
    "single-task global window), so the scoring shards across the "
    "customer dimension at any scale. Rankings order by the ROUNDED "
    "monetary + custkey tie-break per the repo's cross-engine "
    "discipline; 2-decimal sums round boundary-free; output is "
    "<= 125 cells",
)
def q98_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import rfm_segments

    return rfm_segments(
        _t(spark, sf_dir, "orders"),
        entity_col="o_custkey",
        ts_col="o_orderdate",
        amount_col="o_totalprice",
    )


@_q(
    "q99_mad_outliers",
    """
    WITH v AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    med AS (
        SELECT event_type, quantile_cont(CAST(v AS DOUBLE), 0.5) AS med_units
        FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, med.med_units, abs(v.v - med.med_units) AS dev
        FROM v JOIN med ON v.event_type = med.event_type
    ),
    mad AS (
        SELECT event_type, med_units, CAST(count(*) AS BIGINT) AS n,
               quantile_cont(dev, 0.5) AS mad_units
        FROM dev GROUP BY event_type, med_units
    )
    SELECT d.event_type, m.n, m.med_units, m.mad_units,
           CAST(sum(CASE WHEN d.dev > 3.0 * 1.4826 * m.mad_units
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, m.n, m.med_units, m.mad_units
    """,
    "Robust outlier report per event type via 1.4826·MAD "
    "(operators.expectations.mad_outliers — the data-quality check a "
    "mean/stddev z-score can't do: a single pathological value drags "
    "a stddev threshold but not a median one). Exact-integer-units "
    "construction: values lift to cents, both medians are exact "
    "doubles on the quarter-unit grid (interpolated percentile — "
    "q34's proven mechanism), the threshold is one left-associated "
    "IEEE multiply chain both engines share, the tail count compares "
    "exact doubles. Two broadcast-join aggregation passes over one "
    "scan shape; percentile state bounded by the integer value "
    "domain",
)
def q99_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import mad_outliers

    return mad_outliers(
        _t(spark, sf_dir, "events"), value_col="value", group_col="event_type"
    )


@_q(
    "q100_bfs_reach",
    """
    WITH RECURSIVE eb AS (
        SELECT 'c' || CAST(o_custkey AS VARCHAR) AS u,
               's' || CAST(l_suppkey AS VARCHAR) AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (
        SELECT u, v FROM eb WHERE u <> v
        UNION
        SELECT v, u FROM eb WHERE u <> v
    ),
    seeds AS (
        SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    ),
    reach(node, hop) AS (
        SELECT node, 0 FROM seeds
        UNION
        SELECT e.v, r.hop + 1
        FROM reach r JOIN e ON e.u = r.node WHERE r.hop < 3
    ),
    d AS (SELECT node, min(hop) AS hop FROM reach GROUP BY node)
    SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes
    FROM d GROUP BY hop
    """,
    "k-hop BFS reach ('blast radius') from one nation's customers "
    "over the undirected customer—supplier co-transaction graph "
    "(operators.graph.bfs_hops): how many nodes first become "
    "reachable at each hop <= 3. Level-synchronous frontier "
    "iteration — one node-keyed join of the frontier against the "
    "cached symmetrized edge set per round + anti-join against "
    "visited, so per-round cost is the frontier's adjacency, never "
    "the graph re-walked; all-integer set arithmetic. Oracle is a "
    "recursive CTE whose min(hop) per node equals the BFS distance "
    "(every <= 3-hop walk enumerated, state bounded 4|V| by the "
    "(node, hop) dedup)",
)
def q100_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.graph import bfs_hops

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .join(
            _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
        )
    )
    return bfs_hops(edges, seeds, max_hops=3)


@_q(
    "q101_conversion_lag",
    """
    WITH u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id, min(epoch_us(u.t1)) AS t1_us,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > u.t1
                   THEN epoch_us(e.ts) END) AS t2_us
        FROM events e JOIN u ON e.user_id = u.user_id
        GROUP BY e.user_id
    )
    SELECT (t2_us - t1_us) // 3600000000 AS lag_bucket,
           CAST(count(*) AS BIGINT) AS n_users
    FROM v WHERE t2_us IS NOT NULL GROUP BY 1
    """,
    "Time-to-convert histogram signup→purchase in hour buckets "
    "(operators.events.conversion_lag — the 'how long does conversion "
    "take' readout beside the funnel's 'how many'): first-occurrence "
    "ordered semantics shared with q74, lags in exact integer "
    "microseconds, bucket by INTEGER division (a double division's "
    "correctly-rounded quotient can land exactly on the next integer "
    "and flip floor cross-engine). One user-keyed shuffle — the "
    "window min and the conditional-min agg share the exchange; "
    "output is bucket-count-sized",
)
def q101_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import conversion_lag

    return conversion_lag(
        _t(spark, sf_dir, "events"), step_from="signup", step_to="purchase"
    )


@_q(
    "q102_ewma_levels",
    """
    WITH agg AS (
        SELECT event_type AS grp, date_trunc('hour', ts) AS bucket_ts,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS n_buckets,
           round(list_reduce(list(CAST(n AS DOUBLE) ORDER BY bucket_ts),
                             (a, x) -> 0.2 * x + 0.8 * a), 6) AS ewma
    FROM agg GROUP BY grp
    """,
    "EWMA smoothed level of hourly event rates per type "
    "(operators.timeseries.ewma_levels — the trend/level signal "
    "beside rolling_anomalies' spikes and CUSUM's sustained shifts). "
    "The recursion has no float-safe closed form, so it runs as an "
    "ORDERED LEFT FOLD both engines execute identically: Spark "
    "aggregate over the time-sorted count array vs DuckDB "
    "list_reduce over list(x ORDER BY bucket_ts) — both "
    "accumulator-first with first-element init, the step spelled "
    "'a*x + (1-a)*acc' textually in both, so results are "
    "bit-identical before any rounding. One group-keyed shuffle; "
    "arrays are series-sized (bucket counts), never event-sized",
)
def q102_ewma_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import ewma_levels

    return ewma_levels(_t(spark, sf_dir, "events"), alpha=0.2)


@_q(
    "q103_cms_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(text, '\\s+')) AS item
        FROM documents
    ),
    cells AS (
        SELECT 0 AS row, ({_CMS_CELL(0)}) AS col FROM toks UNION ALL
        SELECT 1, ({_CMS_CELL(1)}) FROM toks UNION ALL
        SELECT 2, ({_CMS_CELL(2)}) FROM toks UNION ALL
        SELECT 3, ({_CMS_CELL(3)}) FROM toks
    ),
    sk AS (SELECT row, col, count(*) AS cnt FROM cells GROUP BY row, col),
    probes AS (SELECT DISTINCT item FROM toks),
    lk AS (
        SELECT p.item, r.row,
               ({_md5h60_sql("'cms-r' || CAST(r.row AS VARCHAR) || ':' || p.item")})
                   % 1024 AS col
        FROM probes p CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS row) r
    ),
    est AS (
        SELECT lk.item, min(coalesce(sk.cnt, 0)) AS est
        FROM lk LEFT JOIN sk ON lk.row = sk.row AND lk.col = sk.col
        GROUP BY lk.item
    )
    SELECT item, CAST(est AS BIGINT) AS est
    FROM est ORDER BY est DESC, item LIMIT 20
    """,
    "Top-20 heavy hitters by Count-Min estimate over the document "
    "token stream (operators.sketches.cms_heavy_hitters): every "
    "DISTINCT token probed against the q80 sketch, ranked "
    "(est DESC, item) — deterministic because sketch CONTENTS are "
    "bit-identical cross-engine (portable md5 cells) and estimates "
    "are integers. Overcount-only guarantee: a true heavy hitter can "
    "never be hidden, only a light item promoted. Stream cached once "
    "for build + probes; probe side is vocabulary-sized; top-k is a "
    "TakeOrdered, not a global sort",
)
def q103_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import cms_heavy_hitters

    items = _t(spark, sf_dir, "documents").select(
        F.explode(TX.tokens("text")).alias("item")
    )
    return cms_heavy_hitters(items, k=20)


# derived from the operator's own tuple (the _STOPWORD_SQL_LIST
# precedent) — a hand-copied literal would silently diverge if
# RAKE_STOPWORDS is ever tuned
from dataflow_python_etl_spark.operators.profile import RAKE_STOPWORDS as _RAKE_STOP

_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOP)


@_q(
    "q104_rake_keywords",
    f"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(regexp_split_to_array(text, '\\s+')) AS tok,
               generate_subscripts(regexp_split_to_array(text, '\\s+'), 1)
                   AS pos
        FROM documents
    ),
    flag AS (
        SELECT doc, pos,
               regexp_replace(lower(tok), '[^a-z0-9]', '', 'g') AS norm
        FROM tok
    ),
    runs AS (
        SELECT doc, pos, norm, brk,
               sum(brk) OVER (PARTITION BY doc ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run
        FROM (
            SELECT doc, pos, norm,
                   CASE WHEN norm = '' OR norm IN ({_RAKE_STOP_SQL})
                        THEN 1 ELSE 0 END AS brk
            FROM flag
        )
    ),
    members AS (
        SELECT doc, run, pos, norm,
               count(*) OVER (PARTITION BY doc, run) AS plen
        FROM runs WHERE brk = 0
    ),
    ws AS (
        SELECT norm, count(*) AS freq, sum(plen) AS deg
        FROM members GROUP BY norm
    ),
    inst AS (
        SELECT m.doc, m.run,
               array_to_string(list(m.norm ORDER BY m.pos), ' ') AS phrase,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(ws.deg) AS BIGINT) AS sum_deg,
               CAST(sum(ws.freq) AS BIGINT) AS sum_freq
        FROM members m JOIN ws ON m.norm = ws.norm
        GROUP BY m.doc, m.run
    )
    SELECT phrase, min(n_words) AS n_words,
           CAST(count(*) AS BIGINT) AS n_occur,
           min(sum_deg) AS sum_deg, min(sum_freq) AS sum_freq
    FROM inst GROUP BY phrase
    ORDER BY sum_deg DESC, phrase LIMIT 15
    """,
    "RAKE keyword extraction over the corpus (operators.profile."
    "rake_keywords, Rose et al. 2010): candidate phrases = maximal "
    "non-stopword token runs (doc-keyed window run ids), word degree/"
    "frequency corpus-global, phrases ranked by the summed INTEGER "
    "degree (canonical deg/freq ratio derivable from the two reported "
    "exact sums — the round-5 count/sum-shapes float rule). One "
    "token-sized doc-keyed exchange, vocabulary-sized word stats "
    "broadcast back, phrase-keyed agg, TakeOrdered top-15 with full "
    "(sum_deg, phrase) tie-break",
)
def q104_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.profile import rake_keywords

    return rake_keywords(_t(spark, sf_dir, "documents"), k=15)


@_q(
    "q105_value_deciles",
    """
    WITH v AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v_cents, event_id
        FROM events
    ),
    d AS (
        SELECT v_cents,
               ntile(10) OVER (ORDER BY v_cents, event_id) AS decile
        FROM v
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n,
           min(v_cents) AS lo_cents, max(v_cents) AS hi_cents,
           CAST(sum(v_cents) AS BIGINT) AS sum_cents
    FROM d GROUP BY decile
    """,
    "Equal-depth value deciles over the events FACT table "
    "(operators.events.global_ntile applied at fact scale — the "
    "distributed exact-NTILE path q98 uses on the customer dimension, "
    "here ranking every event row): exact-cents integer values with "
    "event_id tie-break for a total order, per-decile count/min/max/"
    "sum all integers. One range exchange + the partitions-row sizes "
    "aggregate — never Spark's single-task ORDER BY window, which is "
    "the difference between a decile report that shards and one that "
    "serializes at 10^11 rows",
)
def q105_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import global_ntile

    v = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("v_cents"), "event_id"
    )
    d = global_ntile(
        v, 10, [("v_cents", "asc"), ("event_id", "asc")], "decile"
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v_cents").alias("lo_cents"),
        F.max("v_cents").alias("hi_cents"),
        F.sum("v_cents").cast("long").alias("sum_cents"),
    )


@_q(
    "q106_revenue_pareto",
    """
    WITH per AS (
        SELECT o_custkey AS entity,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    d AS (
        SELECT cents, ntile(10) OVER (ORDER BY cents DESC, entity) AS decile
        FROM per
    ),
    agg AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS decile_cents
        FROM d GROUP BY decile
    )
    SELECT decile, n_customers, decile_cents,
           CAST(sum(decile_cents) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cents,
           (sum(decile_cents) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * 1000000)
           // (sum(decile_cents) OVER ()) AS share_ppm
    FROM agg
    """,
    "Revenue Pareto curve — cumulative share of order revenue held by "
    "each best-customer decile ('do 20% of customers carry 80%?'), on "
    "top of the q98 machinery (operators.events.global_ntile ranking "
    "customers by exact-cents revenue, custkey tie-break). Every "
    "number is an exact integer: per-price cents lifted BEFORE "
    "summing, cumulative sums over the 10-row decile frame, share as "
    "INTEGER ppm division (no float division anywhere — the round-5 "
    "count/sum-shapes rule). The only global windows run over 10 "
    "rows",
)
def q106_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.events import global_ntile

    per = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("entity"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("entity")
        .agg(F.sum("c").alias("cents"))
    )
    d = global_ntile(per, 10, [("cents", "desc"), ("entity", "asc")], "decile")
    agg = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("decile_cents"),
    )
    ten = Window.orderBy("decile")  # 10-row frame
    cum = F.sum("decile_cents").over(
        ten.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("decile_cents").over(
        ten.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return agg.select(
        "decile",
        "n_customers",
        "decile_cents",
        cum.cast("long").alias("cum_cents"),
        (cum * F.lit(1_000_000)).cast("long").alias("_num"),
        total.cast("long").alias("_den"),
    ).select(
        "decile",
        "n_customers",
        "decile_cents",
        "cum_cents",
        F.expr("_num div _den").alias("share_ppm"),
    )


@_q(
    "q107_shard_manifest",
    f"""
    WITH s AS (
        SELECT doc_id, text,
               ({_md5h60_sql("'shard-v1:' || CAST(doc_id AS VARCHAR)")}) % 8
                   AS shard_id
        FROM documents
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(length(regexp_split_to_array(text, '\\s+'))), 0)
               AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS n_chars,
           bit_xor({_md5h60_sql(
               "'ck-v1:' || CAST(doc_id AS VARCHAR) || ':' "
               "|| coalesce(text, '<null-text>')")})
               AS checksum
    FROM s GROUP BY shard_id
    """,
    "Training-export shard manifest (operators.chunking."
    "shard_manifest): content-addressed shard_id = md5(salt ++ id) "
    "mod 8 — no global sort, no RNG, growth-stable — with per-shard "
    "doc/token/char accounting and a bit-XOR content checksum "
    "(order-independent and associative, so it map-side-combines and "
    "never overflows). One bucket-keyed hash aggregate; every output "
    "is an exact integer, bit-identical across engines",
)
def q107_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.chunking import shard_manifest

    return shard_manifest(_t(spark, sf_dir, "documents"), n_shards=8)


@_q(
    "q108_kfold_split",
    f"""
    WITH f AS (
        SELECT doc_id, text, source,
               ({_md5h60_sql("'kfold-v1:' || source")}) % 5 AS fold
        FROM documents
    )
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(length(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
               AS n_tokens
    FROM f GROUP BY fold
    """,
    "Leakage-proof 5-fold cross-validation accounting (operators."
    "corpus.kfold_by_group): every document of a SOURCE lands in the "
    "same fold (fold = md5(seed ++ source) mod 5 — the k-way sibling "
    "of q53's group split), so fold-i eval never sees a near-"
    "duplicate of fold-i training text. Zero-shuffle assignment; the "
    "report is one map-side-combined aggregate over 5 keys",
)
def q108_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.functions.text import token_count
    from dataflow_python_etl_spark.operators.corpus import kfold_by_group

    return (
        kfold_by_group(_t(spark, sf_dir, "documents"), "source", 5)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("source").cast("long").alias("n_sources"),
            F.sum(token_count("text")).cast("long").alias("n_tokens"),
        )
    )


@_q(
    "q109_seasonal_outliers",
    """
    WITH b AS (
        SELECT event_type AS grp,
               ((datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7) + 7)
                   % 7 AS dow,
               extract(hour FROM ts) AS hod,
               CAST(round(value * 100) AS BIGINT) AS v_cents
        FROM events
    ),
    st AS (
        SELECT grp, dow, hod, CAST(count(*) AS BIGINT) AS n_b,
               sum(v_cents) AS s_b
        FROM b GROUP BY grp, dow, hod
    )
    SELECT b.grp, b.dow,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN b.v_cents * st.n_b > 2 * st.s_b
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
           CAST(sum(CASE WHEN b.v_cents * st.n_b * 2 < st.s_b
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lo
    FROM b JOIN st ON b.grp = st.grp AND b.dow = st.dow AND b.hod = st.hod
    GROUP BY b.grp, b.dow
    """,
    "Seasonal-baseline outlier counts (operators.timeseries."
    "seasonal_outliers): each event judged against ITS OWN (type, "
    "day-of-week, hour) bucket mean via the integer cross-"
    "multiplication v·n > 2·s — no division, no floats, so both "
    "engines compare identical integers. Day-of-week is days-since-"
    "2024-01-01 mod 7 (engine-neutral, unlike 0- vs 1-based "
    "dayofweek()). Bucket stats broadcast back onto the events — the "
    "fact table never crosses a data-sized exchange",
)
def q109_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import seasonal_outliers

    return seasonal_outliers(_t(spark, sf_dir, "events"))


@_q(
    "q110_weekly_drift",
    """
    WITH wk AS (
        SELECT event_type AS grp,
               CAST(date_trunc('week', ts) AS DATE) AS week,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1, 2
    )
    SELECT grp, week, n_events, n_users, sum_cents,
           (n_events * 1000000)
               // (lag(n_events) OVER (PARTITION BY grp ORDER BY week))
               - 1000000 AS volume_drift_ppm,
           (sum_cents * 1000000)
               // (lag(sum_cents) OVER (PARTITION BY grp ORDER BY week))
               - 1000000 AS value_drift_ppm
    FROM wk
    """,
    "Week-over-week drift report (operators.timeseries.weekly_drift): "
    "per event type, volume / distinct users / cent sum plus the "
    "change vs the previous observed week as cur·10⁶ div prev − 10⁶ "
    "— positive-operand integer division, so floor- and truncating-"
    "division engines agree by construction; first week is NULL (no "
    "baseline). One map-side-combined aggregate to a weeks×types "
    "frame; the lag window is partitioned by type over that tiny "
    "frame, never a global order",
)
def q110_weekly_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import weekly_drift

    return weekly_drift(_t(spark, sf_dir, "events"))


@_q(
    "q111_referential_integrity",
    """
    SELECT 'orders->customer' AS relation,
           (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
             LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
               ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
             LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
               ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL)
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
             LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
               ON l.l_partkey = p.p_partkey
            WHERE p.p_partkey IS NULL)
    UNION ALL
    SELECT 'customer->nation',
           (SELECT CAST(count(*) AS BIGINT) FROM customer),
           (SELECT CAST(count(*) AS BIGINT) FROM customer c
             LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
               ON c.c_nationkey = n.n_nationkey
            WHERE n.n_nationkey IS NULL)
    """,
    "Star-schema foreign-key expectations (operators.expectations."
    "referential_integrity): per relation, child rows and parent-miss "
    "counts in ONE key-only scan + left join against the parent's "
    "distinct keys — orphan facts silently vanish from every inner "
    "join downstream, so this is the first data-quality gate a "
    "warehouse runs. Joins declared declaratively: AQE broadcasts "
    "dimension key sets that fit, shuffles the ones that don't",
)
def q111_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import (
        referential_integrity,
    )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    return referential_integrity(
        [
            ("orders->customer", o, "o_custkey", c, "c_custkey"),
            ("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
            ("lineitem->part", li, "l_partkey", _t(spark, sf_dir, "part"), "p_partkey"),
            ("customer->nation", c, "c_nationkey", _t(spark, sf_dir, "nation"), "n_nationkey"),
        ]
    )


@_q(
    "q112_event_cadence",
    """
    WITH g AS (
        SELECT event_type AS grp,
               epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT grp,
           least(gap_us // 60000000, 60) AS bucket,
           CAST(count(*) AS BIGINT) AS n_gaps
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY grp, bucket
    """,
    "Inter-event cadence histogram (operators.events."
    "inter_event_cadence): per event type, the gap since the user's "
    "previous event (any type) in exact µs, INTEGER-divided into "
    "minute buckets with the tail clamped at 60 — the empirical "
    "profile that sizes debounce gaps and session timeouts. One "
    "user-keyed exchange for the lag; the aggregate collapses "
    "map-side onto a bounded |types|·61 key space",
)
def q112_event_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import inter_event_cadence

    return inter_event_cadence(_t(spark, sf_dir, "events"))


@_q(
    "q113_multitouch_attribution",
    """
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c,
               coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS j
        FROM events
    ),
    conv AS (SELECT user_id, j FROM o WHERE c = 1),
    t AS (
        SELECT user_id, j, event_type,
               row_number() OVER (PARTITION BY user_id, j
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id, j) AS k
        FROM o WHERE c = 0
    ),
    m AS (SELECT t.* FROM t
          JOIN conv ON t.user_id = conv.user_id AND t.j = conv.j),
    cr AS (
        SELECT event_type AS touch_type,
               sum(1000000 // k
                   + CASE WHEN rn = 1 THEN 1000000 % k ELSE 0 END)
                   AS credit_ppm
        FROM m GROUP BY event_type
        UNION ALL
        SELECT 'none',
               (SELECT count(*) FROM conv cv
                 WHERE NOT EXISTS (SELECT 1 FROM t
                                   WHERE t.user_id = cv.user_id
                                     AND t.j = cv.j))
               * 1000000
    )
    SELECT touch_type, CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm
    FROM cr GROUP BY touch_type
    """,
    "Linear multi-touch attribution (operators.events."
    "attribution_multitouch): each conversion's credit split equally "
    "over the touches of its journey (since the user's previous "
    "conversion) in EXACT integer ppm — 10⁶ div k per touch, the "
    "earliest touch absorbs 10⁶ mod k — so total credit is exactly "
    "n_conversions·10⁶ with no float accumulation anywhere. "
    "Touch-less conversions credit 'none'; journeys numbered by an "
    "exclusive-frame running conversion count over the shared "
    "(user, ts, id) ordering, which the (user, journey) window and "
    "join both re-use",
)
def q113_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import attribution_multitouch

    return attribution_multitouch(_t(spark, sf_dir, "events"))


@_q(
    "q114_stickiness",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    w AS (
        SELECT days.d AS day, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
        FROM days JOIN ud
          ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        GROUP BY days.d
    ),
    a AS (
        SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d
    )
    SELECT a.day, a.dau, w.wau,
           (a.dau * 1000000) // w.wau AS stickiness_ppm
    FROM a JOIN w ON a.day = w.day
    """,
    "DAU/WAU stickiness per observed day (operators.events."
    "active_user_stickiness): trailing-7-day distinct actives vs "
    "daily actives in integer ppm. Distinct doesn't decompose over "
    "sliding frames, so the scale shape is ONE (user, day) dedup, "
    "then a bounded 7× explode equality-joined to the broadcast day "
    "spine — never a |user-days|·|spine| nested-loop range join. The "
    "oracle spells the same window as BETWEEN over the day spine",
)
def q114_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import active_user_stickiness

    return active_user_stickiness(_t(spark, sf_dir, "events"))


@_q(
    "q115_order_consistency",
    """
    WITH s AS (
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS s_c4
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN abs(coalesce(s.s_c4, 0)
                     - CAST(round(o_totalprice * 100) AS BIGINT) * 10000) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
           CAST(max(abs(coalesce(s.s_c4, 0)
                     - CAST(round(o_totalprice * 100) AS BIGINT) * 10000))
               AS BIGINT) AS max_abs_diff
    FROM orders o LEFT JOIN s ON o.o_orderkey = s.l_orderkey
    GROUP BY o_orderstatus
    """,
    "Cross-table aggregate-consistency expectation: does each "
    "order's header total equal its lineitems' discounted+taxed sum? "
    "Checked ENTIRELY in lifted integers — cents × (100−disc₂) × "
    "(100+tax₂), header total lifted to the same 10⁻⁴-cent unit — so "
    "no float product can round differently across engines (the "
    "Deequ-style reconciliation check between a fact and its "
    "rollup). Orders with no lineitems reconcile against 0. One "
    "order-keyed partial agg + one join; report collapses to "
    "|statuses| rows",
)
def q115_order_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            * (F.lit(100) + F.round(F.col("l_tax") * 100).cast("long"))
        ).alias("s_c4")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10000)).alias(
            "t_c4"
        ),
    )
    diff = F.abs(F.coalesce(F.col("s_c4"), F.lit(0)) - F.col("t_c4"))
    return (
        o.join(s, o["o_orderkey"] == s["l_orderkey"], "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum((diff > 0).cast("long")).cast("long").alias("n_mismatch"),
            F.max(diff).cast("long").alias("max_abs_diff"),
        )
    )


@_q(
    "q116_join_key_skew",
    """
    WITH c AS (
        SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c)
    SELECT key, n_rows, n_rows * n_rows AS pair_volume,
           (n_rows * 1000000) // t.total AS share_ppm
    FROM c, t
    ORDER BY n_rows DESC, key
    LIMIT 10
    """,
    "Join-key skew diagnostic (operators.profile.join_key_skew): the "
    "10 heaviest l_partkey values with row count, SELF-JOIN pair "
    "volume n² (the single-task shuffle size a join on this key "
    "would create), and table share in integer ppm — the report to "
    "read BEFORE keying a 100 TB join (salt or AQE-skew the keys it "
    "names). One map-side-combined count agg, 1-row total broadcast, "
    "distributed TakeOrdered with (count DESC, key) determinism",
)
def q116_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.profile import join_key_skew

    return join_key_skew(_t(spark, sf_dir, "lineitem"), "l_partkey")


@_q(
    "q117_fastest_paths",
    """
    WITH RECURSIVE g AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_t,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    e AS (
        SELECT prev_t AS src, event_type AS dst,
               min((epoch_us(ts) - epoch_us(prev_ts)) // 1000000) AS w
        FROM g WHERE prev_t IS NOT NULL AND prev_t <> event_type
        GROUP BY prev_t, event_type
    ),
    p AS (
        SELECT 'signup' AS node, CAST(0 AS BIGINT) AS d, 0 AS hops
        UNION ALL
        SELECT e.dst, p.d + e.w, p.hops + 1
        FROM p JOIN e ON e.src = p.node WHERE p.hops < 4
    )
    SELECT node, CAST(min(d) AS BIGINT) AS dist_s FROM p GROUP BY node
    """,
    "Fastest paths through the product (operators.graph."
    "weighted_shortest_paths): nodes are event types, edge weight = "
    "the MINIMUM observed transition gap in whole seconds (exact-µs "
    "lag, INTEGER division), distances = cheapest walk from 'signup' "
    "within 4 hops — bounded Bellman-Ford whose k-th round equals "
    "the oracle's hop-bounded recursive-CTE walk enumeration by "
    "construction. The fact-sized work is the one window pass "
    "deriving the |types|² edge list; relaxation is vocabulary-sized "
    "against the broadcast edges. Integer weights only (the "
    "count/sum float rule)",
)
def q117_fastest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.graph import weighted_shortest_paths

    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    g = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "__gap_us"
        ),
    )
    edges = (
        g.where(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .select("src", "dst", F.expr("__gap_us div 1000000").alias("w"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )
    return weighted_shortest_paths(edges, "signup").select(
        "node", F.col("d").cast("long").alias("dist_s")
    )


@_q(
    "q118_snapshot_diff",
    """
    WITH o AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    n AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS cents
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT
        CAST(coalesce(sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_added,
        CAST(coalesce(sum(CASE WHEN n.k IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_removed,
        CAST(coalesce(sum(CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
                 AND (o.st IS DISTINCT FROM n.st
                      OR o.cents IS DISTINCT FROM n.cents)
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_changed,
        CAST(coalesce(sum(CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
                 AND o.st IS NOT DISTINCT FROM n.st
                 AND o.cents IS NOT DISTINCT FROM n.cents
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unchanged
    FROM o FULL OUTER JOIN n ON o.k = n.k
    """,
    "Snapshot reconciliation (operators.expectations.table_diff): "
    "added/removed/changed/unchanged counts between two keyed "
    "snapshots in ONE full-outer join — the 'what did this refresh "
    "actually do' gate. Snapshots here are two deterministic "
    "derivations of orders (key mod filters; the 'new' side bumps "
    "every 11th total by a cent) so the oracle sees identical "
    "inputs; compare columns are EXACT types (status string, "
    "cents-lifted total) per the repo float rules, null-safe struct "
    "equality ≡ per-column IS DISTINCT FROM",
)
def q118_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import table_diff

    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    old = base.where(F.col("k") % 7 != 0)
    new = base.where(F.col("k") % 5 != 0).withColumn(
        "cents",
        F.col("cents") + F.when(F.col("k") % 11 == 0, 1).otherwise(0),
    )
    return table_diff(old, new, ["k"], ["st", "cents"])


@_q(
    "q119_user_growth",
    """
    WITH fs AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS day
        FROM events GROUP BY user_id
    ),
    n AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM fs GROUP BY day)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumulative_users
    FROM n
    """,
    "User growth curve: first-seen day per user (one user-keyed "
    "min-aggregate — cumulative DISTINCT is monotone, so it reduces "
    "to new-user counts prefix-summed), then per-day new users and "
    "the running total. The only global-order window runs over the "
    "≤|days| frame, never rows. Pairs with q114's stickiness as the "
    "top-of-dashboard pair",
)
def q119_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    fs = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("day"))
    )
    n = fs.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return n.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@_q(
    "q120_entry_conversion",
    """
    WITH flagged AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 300
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS session_idx
        FROM flagged
    ),
    per AS (
        SELECT user_id, session_idx,
               min(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY user_id, session_idx
                  ORDER BY ts, event_id) AS rn
              FROM sessions)
        GROUP BY user_id, session_idx
    )
    SELECT entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           (sum(converted) * 1000000) // count(*) AS conversion_ppm
    FROM per GROUP BY entry_type
    """,
    "Session entry-type conversion: sessions cut by q32's 5-minute "
    "gap rule, each labeled with its FIRST event type and whether a "
    "purchase occurred inside it — conversion rate per entry point "
    "in positive-operand integer ppm ('which door do buyers come "
    "in through'). The session flag, running index, entry rank, and "
    "per-session rollup all share the ONE user-keyed exchange "
    "(subset-clustering rule); the final aggregate collapses onto "
    "the |types| vocabulary",
)
def q120_entry_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    epoch = F.col("ts").cast("double")
    prev = F.lag(F.col("ts")).over(w).cast("double")
    sess = ev.withColumn(
        "new_session",
        F.when((epoch - prev > 300) | prev.isNull(), 1).otherwise(0),
    ).withColumn("session_idx", F.sum("new_session").over(wf))
    ws = Window.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    per = (
        sess.withColumn("rn", F.row_number().over(ws))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("event_type"))).alias("entry_type"),
            F.max((F.col("event_type") == "purchase").cast("long")).alias(
                "converted"
            ),
        )
    )
    return per.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("sum(converted) * 1000000 div count(*)").alias("conversion_ppm"),
    )


@_q(
    "q121_kmv_audience_overlap",
    f"""
    WITH keys AS (
        SELECT DISTINCT o_orderpriority AS set_id, o_custkey AS ck
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    h AS (SELECT DISTINCT set_id, {_md5h60_sql("CAST(ck AS VARCHAR)")} AS h FROM keys),
    r AS (SELECT set_id, h,
                 row_number() OVER (PARTITION BY set_id ORDER BY h) AS rn
          FROM h),
    a AS (SELECT h FROM r WHERE set_id = '1-URGENT' AND rn <= 256),
    b AS (SELECT h FROM r WHERE set_id = '2-HIGH' AND rn <= 256),
    u AS (SELECT DISTINCT h
          FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
          ORDER BY h LIMIT 256),
    s AS (SELECT
            (SELECT count(*) FROM a) AS na, (SELECT max(h) FROM a) AS ra,
            (SELECT count(*) FROM b) AS nb, (SELECT max(h) FROM b) AS rb,
            (SELECT count(*) FROM u) AS nu, (SELECT max(h) FROM u) AS ru,
            (SELECT count(*) FROM u
             WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS c)
    SELECT CAST(256 AS INT) AS k,
           CAST(CASE WHEN na < 256 THEN na
                ELSE 255 * (1152921504606846976 // ra) END AS BIGINT) AS est_a,
           CAST(CASE WHEN nb < 256 THEN nb
                ELSE 255 * (1152921504606846976 // rb) END AS BIGINT) AS est_b,
           CAST(CASE WHEN nu < 256 THEN nu
                ELSE 255 * (1152921504606846976 // ru) END AS BIGINT) AS est_union,
           CAST(c AS BIGINT) AS n_common,
           CAST(CASE WHEN nu = 0 THEN 0 ELSE c * 1000000 // nu END AS BIGINT) AS jaccard_ppm
    FROM s
    """,
    "Audience overlap via KMV sketches (operators.sketches."
    "kmv_overlap): customers who placed URGENT vs HIGH-priority "
    "orders (both present at every SF, unlike order years), their "
    "union size, and the Jaccard overlap — all from two 256-hash "
    "sketches, never a full set intersection. KMV on the portable "
    "60-bit md5 hash is a DETERMINISTIC function of each set, so the "
    "oracle reproduces sketch CONTENTS; estimates are all-integer "
    "((k-1) * (M div R_k), overflow-free since R_k >= k-1) and the "
    "Jaccard is positive-operand integer ppm. The row_number <= k "
    "rank plans as a partial WindowGroupLimit — map tasks truncate "
    "to k rows BEFORE the shuffle, so a billion-member audience "
    "ships k hashes per task. Set algebra no other sketch here "
    "gives: CMS ranks frequencies, HLL sizes one set; KMV "
    "intersects them",
)
def q121_kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import kmv_overlap

    od = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("set_id"), "o_custkey"
    )
    return kmv_overlap(od, "set_id", "o_custkey", "1-URGENT", "2-HIGH", k=256)


@_q(
    "q122_feed_freshness",
    """
    WITH nw AS (SELECT epoch_us(max(ts)) AS now_us FROM events),
    per AS (
        SELECT event_type AS grp,
               max(epoch_us(ts)) AS last_us, max(now_us) AS now_us,
               sum(CASE WHEN epoch_us(ts) > now_us - 604800000000
                        THEN 1 ELSE 0 END) AS n_recent,
               sum(CASE WHEN epoch_us(ts) <= now_us - 604800000000
                         AND epoch_us(ts) > now_us - 1209600000000
                        THEN 1 ELSE 0 END) AS n_prior
        FROM events, nw GROUP BY event_type
    )
    SELECT grp,
           CAST((now_us - last_us) // 1000000 AS BIGINT) AS lag_s,
           CAST(n_recent AS BIGINT) AS n_recent,
           CAST(n_prior AS BIGINT) AS n_prior,
           CAST(CASE WHEN n_prior = 0 THEN NULL
                ELSE (n_recent * 1000000) // n_prior END AS BIGINT)
               AS volume_ratio_ppm,
           CAST(CASE WHEN (now_us - last_us) // 1000000 > 259200
                THEN 1 ELSE 0 END AS INT) AS stale
    FROM per
    """,
    "Feed freshness + volume expectation (operators.expectations."
    "freshness_check): per event type, seconds since the last event "
    "(vs the CORPUS max instant — deterministic, never wall-clock), "
    "last-7-days volume vs the prior 7 days in positive-operand "
    "integer ppm (NULL when the prior window is empty), stale flag "
    "at 3 days. The 'did the feed die or quietly halve' gate. One "
    "group-keyed aggregate with the 1-row max-instant broadcast; "
    "exact-µs integer arithmetic throughout (the q101 div rule)",
)
def q122_feed_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import freshness_check

    return freshness_check(_t(spark, sf_dir, "events"))


@_q(
    "q123_daily_autocorrelation",
    """
    WITH b AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT g, min(d) AS mn, max(d) AS mx FROM b GROUP BY g),
    spine AS (
        SELECT g, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM r
    ),
    x AS (
        SELECT spine.g, spine.d, coalesce(b.c, 0) AS x
        FROM spine LEFT JOIN b ON spine.g = b.g AND spine.d = b.d
    ),
    p AS (
        SELECT g, x, lead(x) OVER (PARTITION BY g ORDER BY d) AS y FROM x
    ),
    q AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM p WHERE y IS NOT NULL GROUP BY g
    )
    SELECT g AS grp,
           CAST(n + 1 AS BIGINT) AS n_days,
           n AS n_pairs,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round((n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                           6)
           END AS r1
    FROM q
    """,
    "Lag-1 autocorrelation of daily event volume (operators."
    "timeseries.daily_autocorrelation): Pearson r over consecutive "
    "(day, next-day) count pairs on the COMPLETE per-group day spine "
    "(missing days are 0 — raw observed days would splice across "
    "outages and fake continuity). Integer moments exactly, ONE "
    "division by the product of two IEEE-exact sqrts, round 6 — the "
    "rolling-anomalies float construction. The periodicity signal "
    "that justifies seasonal_outliers' hour-of-week baseline. Fact "
    "collapses map-side onto (group, day) in one exchange; all else "
    "is day-spine-sized",
)
def q123_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import daily_autocorrelation

    return daily_autocorrelation(_t(spark, sf_dir, "events"))


@_q(
    "q124_segment_mode_priority",
    """
    WITH c AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS pri,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    r AS (
        SELECT seg, pri, n_orders,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY n_orders DESC, pri) AS rn
        FROM c
    )
    SELECT seg, pri AS mode_priority, n_orders FROM r WHERE rn = 1
    """,
    "Per-group MODE with a deterministic tie-break: the most common "
    "order priority per customer market segment — groupBy count, "
    "then row_number over (count DESC, value ASC) taking rank 1 "
    "(ties break on the VALUE, never on engine-private hash order — "
    "the rounded-score+id ranking rule). The argmax-per-group shape "
    "every 'top category per X' dashboard tile reduces to; the "
    "window runs on the |segments|x|priorities| rollup, never the "
    "fact table",
)
def q124_segment_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    w = Window.partitionBy("seg").orderBy(F.col("n_orders").desc(), F.col("pri"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("seg", F.col("pri").alias("mode_priority"), "n_orders")
    )


@_q(
    "q125_seasonal_naive_backtest",
    """
    WITH b AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT g, min(d) AS mn, max(d) AS mx FROM b GROUP BY g),
    spine AS (
        SELECT g, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM r
    ),
    x AS (
        SELECT spine.g, spine.d, coalesce(b.c, 0) AS x
        FROM spine LEFT JOIN b ON spine.g = b.g AND spine.d = b.d
    ),
    p AS (
        SELECT g, x, lag(x, 7) OVER (PARTITION BY g ORDER BY d) AS f FROM x
    ),
    agg AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(abs(x - f)) AS BIGINT) AS total_abs_err,
               CAST(sum(x) AS BIGINT) AS total_actual
        FROM p WHERE f IS NOT NULL GROUP BY g
    )
    SELECT g AS grp, n_eval, total_abs_err, total_actual,
           CAST(CASE WHEN total_actual = 0 THEN NULL
                ELSE (total_abs_err * 1000000) // total_actual END AS BIGINT)
               AS wmape_ppm
    FROM agg
    """,
    "Seasonal-naive forecast backtest (operators.timeseries."
    "seasonal_naive_backtest): predict each day's event volume with "
    "the same weekday LAST week on the complete day spine, report "
    "Σ|err|, Σactual, and weighted MAPE in positive-operand integer "
    "ppm (count/sum shapes — a mean of errors would round(avg) onto "
    "half-boundaries). The baseline any forecast model must beat, "
    "and the error floor q123's autocorrelation predicts. One "
    "map-side (group, day) fact collapse; spine-sized lag window",
)
def q125_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    return seasonal_naive_backtest(_t(spark, sf_dir, "events"))


def _mmr_oracle_sql(k: int = 5, n_candidates: int = 20) -> str:
    """Unroll the MMR greedy (λ=½ exact, rounded-6 cosines, id
    tie-break) step by step — the loop ≡ unrolled-CTE pin, applied
    to a greedy argmax instead of PageRank's fixpoint."""
    steps = []
    sels = []
    for i in range(1, k + 1):
        if i == 1:
            steps.append(
                "p1 AS (SELECT id, rel, 0.5 * rel - 0.5 * 0.0 AS mmr "
                "FROM cand ORDER BY mmr DESC, id LIMIT 1)"
            )
            sels.append("sel1 AS (SELECT id FROM p1)")
        else:
            steps.append(
                f"p{i} AS (SELECT c.id, c.rel, 0.5 * c.rel - 0.5 * coalesce("
                f"(SELECT max(sim) FROM pair WHERE ia = c.id AND "
                f"ib IN (SELECT id FROM sel{i - 1})), 0.0) AS mmr "
                f"FROM cand c WHERE c.id NOT IN (SELECT id FROM sel{i - 1}) "
                f"ORDER BY mmr DESC, c.id LIMIT 1)"
            )
            sels.append(
                f"sel{i} AS (SELECT id FROM sel{i - 1} UNION ALL SELECT id FROM p{i})"
            )
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rank, id AS vec_id, rel AS relevance, mmr "
        f"FROM p{i}"
        for i in range(1, k + 1)
    )
    ctes = []
    for s, sl in zip(steps, sels):
        ctes.append(s)
        ctes.append(sl)
    return f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    c0 AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id != 0
    ),
    s AS (
        SELECT id, {_cosine_sql('qv', 'cv')} AS rel FROM c0, q
    ),
    cand AS (SELECT id, rel FROM s ORDER BY rel DESC, id LIMIT {n_candidates}),
    v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS cv FROM embeddings
        WHERE vec_id IN (SELECT id FROM cand)
    ),
    pair AS (
        SELECT a.id AS ia, b.id AS ib, {_cosine_sql('a.cv', 'b.cv')} AS sim
        FROM v a JOIN v b ON a.id != b.id
    ),
    {', '.join(ctes)}
    {union}
    """


@_q(
    "q126_mmr_diverse_topk",
    _mmr_oracle_sql(),
    "Maximal Marginal Relevance selection (operators.similarity."
    "mmr_select, Carbonell & Goldstein 1998): 5 diverse-but-relevant "
    "neighbors for query vector 0 from a 20-candidate cosine "
    "shortlist — greedy argmax of ½·rel − ½·max-sim-to-selected. "
    "Plain top-k returns five near-copies of the best hit; MMR "
    "returns the best hit plus four that ADD something — the RAG "
    "context and training-batch diversification primitive. λ=½ is a "
    "power of two so both terms are EXACT scalings of the rounded-6 "
    "cosines (one correctly-rounded subtraction per comparison), "
    "making the greedy bit-reproducible — the oracle unrolls the "
    "same 5 steps (loop ≡ unrolled, as PageRank). Only the bounded "
    "shortlist enters the n²-pair stage; the corpus only streams "
    "through cosine_topk",
)
def q126_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.similarity import mmr_select

    return mmr_select(_t(spark, sf_dir, "embeddings"), query_id=0, k=5,
                      n_candidates=20)


@_q(
    "q127_cms_join_size",
    f"""
    WITH it AS (SELECT CAST(l_partkey AS VARCHAR) AS item FROM lineitem),
    cells AS (
        SELECT 0 AS row, ({_CMS_CELL(0)}) AS col FROM it UNION ALL
        SELECT 1, ({_CMS_CELL(1)}) FROM it UNION ALL
        SELECT 2, ({_CMS_CELL(2)}) FROM it UNION ALL
        SELECT 3, ({_CMS_CELL(3)}) FROM it
    ),
    sk AS (SELECT row, col, count(*) AS cnt FROM cells GROUP BY row, col),
    est AS (
        SELECT min(s) AS est_pairs
        FROM (SELECT row, sum(cnt * cnt) AS s FROM sk GROUP BY row)
    ),
    exact AS (
        SELECT sum(c * c) AS exact_pairs
        FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey)
    )
    SELECT CAST(est_pairs AS BIGINT) AS est_pairs,
           CAST(exact_pairs AS BIGINT) AS exact_pairs,
           (est_pairs >= exact_pairs) AS overcount_ok,
           CAST((est_pairs - exact_pairs) * 1000000 // exact_pairs AS BIGINT)
               AS overshoot_ppm
    FROM est, exact
    """,
    "Join-size pre-flight from a sketch (operators.sketches."
    "cms_self_join_size): the row count 'lineitem self-joined on "
    "l_partkey' WOULD produce — Σ f(k)², the AMS second moment — "
    "read off the 4x1024 portable-hash CMS in d·w integers, beside "
    "the exact Σ f(k)² and the overshoot in ppm. Never undercounts "
    "(collision cross terms only add — verified column), so a green "
    "estimate clears the join; a red one routes to q116's exact "
    "top-k skew diagnostic and salting. The 100 TB point: the "
    "estimate needs no shuffle of the key — the sketch build is one "
    "map-side explode + bounded agg",
)
def q127_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import (
        cms_self_join_size,
        count_min_sketch,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("item")
    )
    est = cms_self_join_size(count_min_sketch(li))
    exact = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_pairs"))
    )
    return est.crossJoin(exact).select(
        "est_pairs",
        "exact_pairs",
        (F.col("est_pairs") >= F.col("exact_pairs")).alias("overcount_ok"),
        F.expr("((est_pairs - exact_pairs) * 1000000) div exact_pairs").alias(
            "overshoot_ppm"
        ),
    )


@_q(
    "q128_bm25_indexed",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    lens AS (SELECT doc_id, len(toks) AS dl FROM tok),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    tf AS (
        SELECT doc_id, w, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS w FROM tok)
        WHERE w IN ('table', 'vector', 'spark')
        GROUP BY doc_id, w
    ),
    dft AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    sc AS (
        SELECT t.doc_id,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                 * (t.tf * (1.2 + 1))
                 / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / avgdl)) AS s
        FROM tf t
        JOIN lens l USING (doc_id)
        JOIN dft USING (w)
        CROSS JOIN stats
    )
    SELECT doc_id, round(sum(s), 6) AS bm25,
           CAST(count(*) AS BIGINT) AS n_terms_matched
    FROM sc GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    "Persisted-postings BM25 probe (operators.search.build_search_"
    "index/search_index): the SAME query and scores as q70, but "
    "served from the on-disk postings index partitioned by a "
    "portable term-hash bucket — the probe scan reads ONLY the "
    "query terms' pbucket partitions (partition pruning, plan-"
    "pinned) so per-query cost is the terms' postings, independent "
    "of corpus size. Doc length rides on the posting (no doclens "
    "join); df is the term's posting count; (n_docs, sum_dl) come "
    "from the crash-safe sidecar. Same oracle as q70 BY DESIGN: "
    "index-probe ≡ corpus-scan is the correctness contract, "
    "incremental append ≡ rebuild is pinned in tests",
)
def q128_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dataflow_python_etl_spark.operators.search import (
        build_search_index,
        search_index,
    )

    # ONE index per sf_dir per process (memoized): an index exists to
    # be built once and probed many times — rebuilding per call would
    # make bench trials measure the build, not the probe, and leak a
    # full index tree per invocation. The deterministic build makes
    # reuse sound; the dir itself is left for OS tmp cleanup (the
    # returned frame reads it lazily).
    path = _SEARCH_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="bm25_index_") + "/idx"
        build_search_index(_t(spark, sf_dir, "documents"), path)
        _SEARCH_INDEX_CACHE[sf_dir] = path
    return search_index(spark, path, ("table", "vector", "spark"))


_SEARCH_INDEX_CACHE: dict = {}


@_q(
    "q129_timedecay_attribution",
    """
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c,
               coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS j
        FROM events
    ),
    conv AS (SELECT user_id, j, ts AS cts FROM o WHERE c = 1),
    t AS (SELECT user_id, j, event_type, ts, event_id FROM o WHERE c = 0),
    m AS (
        SELECT t.user_id, t.j, t.event_type, t.ts, t.event_id,
               (CAST(1 AS BIGINT) << CAST(30 - least(
                   (epoch_us(conv.cts) - epoch_us(t.ts)) // 86400000000, 30)
                   AS INT)) AS w
        FROM t JOIN conv ON t.user_id = conv.user_id AND t.j = conv.j
    ),
    sc AS (
        SELECT event_type,
               (1000000 * w) // sum(w) OVER (PARTITION BY user_id, j) AS base,
               row_number() OVER (PARTITION BY user_id, j
                                  ORDER BY ts DESC, event_id DESC) AS near,
               user_id, j
        FROM m
    ),
    jb AS (
        SELECT event_type, base, near,
               sum(base) OVER (PARTITION BY user_id, j) AS jbase
        FROM sc
    ),
    cr AS (
        SELECT event_type AS touch_type,
               sum(base + CASE WHEN near = 1 THEN 1000000 - jbase
                          ELSE 0 END) AS credit_ppm
        FROM jb GROUP BY event_type
        UNION ALL
        SELECT 'none',
               (SELECT count(*) FROM conv cv
                 WHERE NOT EXISTS (SELECT 1 FROM t
                                   WHERE t.user_id = cv.user_id
                                     AND t.j = cv.j))
               * 1000000
    )
    SELECT touch_type, CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm
    FROM cr GROUP BY touch_type
    """,
    "Time-decay attribution (operators.events.attribution_timedecay): "
    "journey credit weighted by recency at conversion, halving per "
    "day of age — weights are EXACT powers of two (shiftleft on a "
    "bigint, age saturating at 30 half-lives so 10⁶·w stays ~1.1e15, "
    "far inside int64), per-touch credit (10⁶·w) div Σw with the "
    "rounding remainder absorbed by the NEAREST touch — total credit "
    "exactly n_conversions·10⁶ (the q113 conservation law), zero "
    "float accumulation. The recency model between last-touch (q91 "
    "family) and linear (q113); same one-user-keyed-exchange shape",
)
def q129_timedecay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import attribution_timedecay

    return attribution_timedecay(_t(spark, sf_dir, "events"))


@_q(
    "q130_growth_accounting",
    """
    WITH uw AS (
        SELECT DISTINCT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    seq AS (
        SELECT u, wk,
               lag(wk)  OVER (PARTITION BY u ORDER BY wk) AS prev_wk,
               lead(wk) OVER (PARTITION BY u ORDER BY wk) AS next_wk
        FROM uw
    ),
    status AS (
        SELECT wk,
               CASE WHEN prev_wk IS NULL THEN 'new'
                    WHEN prev_wk = wk - 7 THEN 'retained'
                    ELSE 'resurrected' END AS st,
               next_wk
        FROM seq
    ),
    weekly AS (
        SELECT wk AS week,
               CAST(sum(CASE WHEN st = 'new'         THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
               CAST(sum(CASE WHEN st = 'retained'    THEN 1 ELSE 0 END) AS BIGINT) AS retained_users,
               CAST(sum(CASE WHEN st = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS resurrected_users
        FROM status GROUP BY wk
    ),
    churn AS (
        SELECT wk + 7 AS week, CAST(count(*) AS BIGINT) AS churned_users
        FROM status
        WHERE (next_wk IS NULL OR next_wk > wk + 7)
          AND wk + 7 <= (SELECT max(wk) FROM uw)
        GROUP BY 1
    )
    SELECT week,
           coalesce(new_users, 0)         AS new_users,
           coalesce(retained_users, 0)    AS retained_users,
           coalesce(resurrected_users, 0) AS resurrected_users,
           coalesce(churned_users, 0)     AS churned_users
    FROM weekly FULL JOIN churn USING (week)
    """,
    "Weekly growth accounting (new/retained/resurrected/churned ledger; "
    "operators.events.growth_accounting): one (user, week) distinct "
    "exchange, lag/lead classification, lead-derived churn clipped to "
    "the observed horizon by a 1-row broadcast — all-integer counts.",
)
def q130_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import growth_accounting

    return growth_accounting(_t(spark, sf_dir, "events"))


@_q(
    "q131_association_rules",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM b),
    items AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM b GROUP BY p),
    pairs AS (
        SELECT b1.p AS a, b2.p AS c, CAST(count(*) AS BIGINT) AS pn
        FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p
        GROUP BY 1, 2
        HAVING count(*) >= 1
    ),
    rules AS (
        SELECT a AS antecedent, c AS consequent, pn FROM pairs
        UNION ALL
        SELECT c AS antecedent, a AS consequent, pn FROM pairs
    )
    SELECT r.antecedent, r.consequent, r.pn AS support_n,
           CAST((2000000 * r.pn + ia.np) // (2 * ia.np) AS BIGINT) AS conf_ppm,
           CAST((CAST(2000000 AS HUGEINT) * t.n_baskets * r.pn
                 + CAST(ia.np AS HUGEINT) * ic.np)
                // (CAST(2 AS HUGEINT) * ia.np * ic.np) AS BIGINT) AS lift_ppm
    FROM rules r
    JOIN items ia ON r.antecedent = ia.p
    JOIN items ic ON r.consequent = ic.p
    CROSS JOIN tot t
    ORDER BY support_n DESC, lift_ppm DESC, conf_ppm DESC, antecedent, consequent
    LIMIT 40
    """,
    "Market-basket association rules over order baskets "
    "(operators.profile.association_rules): one fact shuffle to "
    "basket item-sets behind a registered persist, bounded pair "
    "fan-out, half-up integer ppm confidence/lift (lift via "
    "DECIMAL(38,0) — 10^6*N*support overflows int64 at real N).",
)
def q131_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.profile import association_rules

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return association_rules(li, "l_orderkey", "l_partkey")


@_q(
    "q132_top_paths",
    """
    WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id, string_agg(event_type, ' > ' ORDER BY rn) AS path
        FROM r WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
    "Top user journeys — first-3 event-type paths counted across "
    "users (operators.events.top_paths): WindowGroupLimit truncates "
    "map-side (bot-proof), per-user assembly reuses the window's "
    "exchange, distributed TakeOrdered top-k.",
)
def q132_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import top_paths

    return top_paths(_t(spark, sf_dir, "events"))


@_q(
    "q133_knn_classify",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (
        SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS cv FROM embeddings
    ),
    s AS (
        SELECT query_id, neighbor_id, label, {_cosine_sql('qv', 'cv')} AS cos_sim
        FROM q, c WHERE neighbor_id != query_id
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM s
    ),
    v AS (
        SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
        FROM r WHERE rk <= 5 GROUP BY 1, 2
    ),
    p AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS pr
        FROM v
    )
    SELECT query_id, label AS predicted_label, votes FROM p WHERE pr = 1
    """,
    "k-NN majority-vote label classification over embeddings "
    "(operators.similarity.knn_classify): exact cosine top-5 with "
    "rounded-score ranking, vote ties to the smallest label — the "
    "label-transfer primitive for auto-tagging a corpus.",
)
def q133_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.knn_classify(emb, emb.where(F.col("vec_id") % 50 == 0), k=5)


@_q(
    "q134_trend_slope",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) - DATE '1970-01-01' AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS HUGEINT)                          AS n,
               CAST(sum(x) AS HUGEINT)                            AS sx,
               CAST(sum(y) AS HUGEINT)                            AS sy,
               CAST(sum(CAST(x AS BIGINT) * y) AS HUGEINT)        AS sxy,
               CAST(sum(CAST(x AS BIGINT) * x) AS HUGEINT)        AS sxx
        FROM d GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(CASE WHEN n * sxy - sx * sy >= 0
                THEN  (2000000 * (n * sxy - sx * sy) + (n * sxx - sx * sx))
                      // (2 * (n * sxx - sx * sx))
                ELSE -((2000000 * (sx * sy - n * sxy) + (n * sxx - sx * sx))
                      // (2 * (n * sxx - sx * sx)))
                END AS BIGINT) AS slope_micro
    FROM s
    """,
    "Per-event-type OLS trend of daily volume in micro-events/day "
    "(operators.timeseries.trend_slope): exact-integer numerator/"
    "denominator, one sign-split half-up division through "
    "DECIMAL(38,0) — cross-engine bit-stable by construction.",
)
def q134_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import trend_slope

    return trend_slope(_t(spark, sf_dir, "events"), "event_type")


@_q(
    "q135_benford_audit",
    """
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    d AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM c WHERE cents > 0 GROUP BY 1
    ),
    spine AS (
        SELECT * FROM (VALUES
            (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
            (6, 66947), (7, 57992), (8, 51153), (9, 45757)
        ) t(digit, expected_micro)
    ),
    f AS (
        SELECT s.digit, coalesce(d.n, 0) AS n,
               CAST(s.expected_micro AS BIGINT) AS expected_micro,
               (SELECT sum(n) FROM d) AS total
        FROM spine s LEFT JOIN d ON s.digit = d.digit
    )
    SELECT digit, n,
           CAST(CASE WHEN total > 0
                THEN (2000000 * n + total) // (2 * total) ELSE 0 END AS BIGINT)
               AS obs_micro,
           expected_micro,
           abs(CAST(CASE WHEN total > 0
                THEN (2000000 * n + total) // (2 * total) ELSE 0 END AS BIGINT)
               - expected_micro) AS dev_micro
    FROM f
    """,
    "Benford first-digit audit of order totals "
    "(operators.expectations.benford_deviation): cents-lifted integer "
    "leading digits, 9-bucket map-side count, hardcoded log10 "
    "literals both engines (ln/log10 are engine-private at the ulp).",
)
def q135_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import benford_deviation

    return benford_deviation(_t(spark, sf_dir, "orders"), "o_totalprice")


@_q(
    "q136_kmv_distinct_mv",
    f"""
    WITH keys AS (
        SELECT DISTINCT event_type AS set_id, user_id AS u FROM events
    ),
    h AS (SELECT DISTINCT set_id, {_md5h60_sql("CAST(u AS VARCHAR)")} AS h FROM keys),
    r AS (SELECT set_id, h,
                 row_number() OVER (PARTITION BY set_id ORDER BY h) AS rn
          FROM h),
    t AS (SELECT set_id, count(*) AS n, max(h) AS rk
          FROM r WHERE rn <= 256 GROUP BY set_id)
    SELECT set_id AS event_type,
           CAST(CASE WHEN n < 256 THEN n
                ELSE 255 * (1152921504606846976 // rk) END AS BIGINT) AS est_users
    FROM t
    """,
    "Distinct-users-per-event-type MATERIALIZED VIEW maintained "
    "incrementally by KMV sketch merge (operators.upsert."
    "refresh_kmv_agg): two half-batches folded under the KMV merge "
    "law, then estimates read off the stored arrays. The ORACLE is "
    "the direct full-data sketch — hash-green IS the "
    "refresh(kmv(A), kmv(B)) = kmv(A U B) law end-to-end. Non-"
    "additive maintenance: replay-idempotent (set union), no ledger.",
)
def q136_kmv_distinct_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dataflow_python_etl_spark.operators.sketches import _kmv_est_int, kmv_sketches
    from dataflow_python_etl_spark.operators.upsert import refresh_kmv_agg

    # ONE MV per sf_dir per process (the q128 memoization rule): an MV
    # exists to be maintained once and read many times — rebuilding
    # per call would measure the build and leak table trees.
    path = _KMV_MV_CACHE.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="kmv_mv_") + "/mv"
        ev = _t(spark, sf_dir, "events")
        for parity in (0, 1):
            batch = ev.where(F.col("event_id") % 2 == parity)
            refresh_kmv_agg(
                spark, path,
                kmv_sketches(batch, "event_type", "user_id", 256),
                ["set_id"], 256,
            )
        _KMV_MV_CACHE[sf_dir] = path
    mv = spark.read.parquet(path)
    return mv.select(
        F.col("set_id").alias("event_type"),
        _kmv_est_int(F.col("hashes"), 256).cast("long").alias("est_users"),
    )


_KMV_MV_CACHE: dict = {}


@_q(
    "q137_conversion_join",
    """
    SELECT v.user_id,
           v.event_id AS trigger_id,
           p.event_id AS conv_id,
           CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS lag_seconds
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 60 MINUTE
    """,
    "View→purchase pair attribution within 60 min "
    "(streaming.pipeline.conversion_join, BATCH surface of the "
    "stream-stream inner join; watermark-bounded state when run on "
    "streams — stream/batch parity pinned in tests).",
)
def q137_conversion_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.streaming.pipeline import conversion_join

    return conversion_join(_t(spark, sf_dir, "events"))


@_q(
    "q138_clustering_coefficients",
    """
    WITH e AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    deg AS (
        SELECT n, count(*) AS d
        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n
    ),
    oriented AS (
        SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS u,
               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS v,
               CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d END AS dv
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
    ),
    wedges AS (
        SELECT o1.u AS u, o1.v AS x, o2.v AS y
        FROM oriented o1 JOIN oriented o2
          ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
    ),
    tri AS (
        SELECT w.u, w.x, w.y
        FROM wedges w JOIN oriented o ON w.x = o.u AND w.y = o.v
    ),
    pern AS (
        SELECT n, CAST(count(*) AS BIGINT) AS t
        FROM (SELECT u AS n FROM tri UNION ALL SELECT x FROM tri
              UNION ALL SELECT y FROM tri)
        GROUP BY n
    )
    SELECT d.n AS node, CAST(d.d AS BIGINT) AS degree,
           coalesce(p.t, 0) AS n_triangles,
           CAST((CAST(4000000 AS HUGEINT) * coalesce(p.t, 0)
                 + CAST(d.d AS HUGEINT) * (d.d - 1))
                // (CAST(2 AS HUGEINT) * d.d * (d.d - 1)) AS BIGINT) AS cc_ppm
    FROM deg d LEFT JOIN pern p ON d.n = p.n
    WHERE d.d >= 2
    ORDER BY cc_ppm DESC, degree DESC, node
    LIMIT 20
    """,
    "Per-node local clustering coefficient on the part co-purchase "
    "graph (operators.graph.clustering_coefficients): same degree-"
    "ordered orientation as q87 plus a |triangles|x3 explode and a "
    "node-keyed count; coefficient in half-up integer ppm.",
)
def q138_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.graph import clustering_coefficients

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )
    return (
        clustering_coefficients(edges)
        .orderBy(F.col("cc_ppm").desc(), F.col("degree").desc(), "node")
        .limit(20)
    )


@_q(
    "q139_m4_downsample",
    """
    WITH src AS (
        SELECT event_type AS series, epoch_us(ts) AS t, event_id AS i, value AS v
        FROM events
    ),
    bounds AS (SELECT min(t) AS lo, max(t) AS hi FROM src),
    b AS (
        SELECT series, (t - lo) * 20 // (hi - lo + 1) AS bucket, t, i, v
        FROM src CROSS JOIN bounds
    ),
    w AS (
        SELECT *,
               row_number() OVER (PARTITION BY series, bucket ORDER BY t, i) AS rf,
               row_number() OVER (PARTITION BY series, bucket ORDER BY t DESC, i DESC) AS rl
        FROM b
    )
    SELECT series, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(max(CASE WHEN rf = 1 THEN v END), 2) AS v_first,
           round(min(v), 2) AS v_min,
           round(max(v), 2) AS v_max,
           round(max(CASE WHEN rl = 1 THEN v END), 2) AS v_last
    FROM w GROUP BY series, bucket
    """,
    "M4 downsampling of event values, 20 buckets per series "
    "(operators.timeseries.m4_downsample, Jugel et al. VLDB 2014): "
    "exact integer micros bucketing off a 1-row bounds broadcast, "
    "one (series,bucket) exchange shared by the first/last windows "
    "and the rollup — the error-free line-chart rollup.",
)
def q139_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.timeseries import m4_downsample

    return m4_downsample(_t(spark, sf_dir, "events"), "event_type", "ts", "value")


@_q(
    "q140_vocab_growth",
    """
    WITH d AS (
        SELECT doc_id, text, ntile(10) OVER (ORDER BY doc_id) AS decile
        FROM documents
    ),
    t AS (
        SELECT decile, unnest(regexp_split_to_array(text, '\\s+')) AS term FROM d
    ),
    f AS (SELECT term, min(decile) AS d0 FROM t WHERE term != '' GROUP BY term),
    c AS (SELECT d0 AS decile, CAST(count(*) AS BIGINT) AS new_terms FROM f GROUP BY 1),
    s AS (
        SELECT CAST(r.range AS INT) AS decile, coalesce(c.new_terms, 0) AS new_terms
        FROM range(1, 11) r LEFT JOIN c ON c.decile = r.range
    )
    SELECT decile, new_terms,
           CAST(sum(new_terms) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_vocab
    FROM s
    """,
    "Vocabulary growth curve (Heaps-law view, log-free): distinct "
    "terms seen after each ingestion-order decile of the corpus — "
    "cumulative-distinct reduces to first-seen min-agg + a 10-row "
    "prefix sum (the q119 trick), deciles via the distributed exact "
    "NTILE (operators.events.global_ntile — range exchange, never a "
    "single-task global window).",
)
def q140_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.events import global_ntile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = global_ntile(docs, 10, [("doc_id", "asc")], "decile")
    first = (
        d.select(
            "decile",
            F.explode(F.array_distinct(TX.tokens(F.col("text")))).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.min("decile").alias("d0"))
    )
    counts = first.groupBy(F.col("d0").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("new_terms")
    )
    spine = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(counts, "decile", "left")
        .select("decile", F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"))
        .select(
            "decile",
            "new_terms",
            F.sum("new_terms").over(w).cast("long").alias("cum_vocab"),
        )
    )


@_q(
    "q141_df_spectrum",
    """
    WITH t AS (
        SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term
        FROM documents
    ),
    f AS (SELECT term, count(*) AS df FROM t WHERE term != '' GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT CAST(df * 10 // n_docs AS INT) AS coverage_decile,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(df) AS BIGINT) AS total_postings
    FROM f CROSS JOIN n GROUP BY 1
    """,
    "Document-frequency spectrum by CORPUS-COVERAGE decile — how "
    "many vocabulary terms appear in 0-10%, 10-20%, ... of documents "
    "(df·10 div n_docs; scale-invariant where an absolute-k histogram "
    "degenerates) — the Zipf-tail profile behind stopword lists, "
    "min-df cuts, and posting-list sizing (q128's index). Per-doc "
    "array_distinct keeps the term exchange map-side reduced; "
    "all-integer arithmetic, 1-row doc-count broadcast.",
)
def q141_df_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    f = (
        docs.select(F.explode(F.array_distinct(TX.tokens(F.col("text")))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        f.crossJoin(F.broadcast(n))
        .groupBy(
            F.expr("df * 10 div n_docs").cast("int").alias("coverage_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("total_postings"),
        )
    )


@_q(
    "q142_revenue_gini",
    """
    WITH r AS (
        SELECT o_custkey, CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    k AS (
        SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS rk FROM r
    ),
    s AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(cents) AS HUGEINT) AS sx,
               sum(CAST(rk AS HUGEINT) * cents) AS sxr
        FROM k
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(sx AS BIGINT) AS total_cents,
           CAST((2000000 * (2 * sxr - (n + 1) * sx) + n * sx)
                // (2 * n * sx) AS BIGINT) AS gini_ppm
    FROM s
    """,
    "Gini coefficient of per-customer revenue in half-up integer ppm "
    "— the concentration number beside q106's Pareto curve. Exact by "
    "construction: rank-weighted sum formula G = (2*Sum(i*x_i) - "
    "(n+1)*Sum(x)) / (n*Sum(x)) over cents with the global rank from "
    "operators.events.global_rank (distributed range-rank, never a "
    "single-task ORDER BY window); products through DECIMAL since "
    "rank*cents sums brush int64 at real customer counts.",
)
def q142_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.events import global_rank
    from dataflow_python_etl_spark.operators.sketches import _int_div, dec38

    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    k = global_rank(rev, [("cents", "asc"), ("o_custkey", "asc")], "rk")
    s = k.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(dec38(F.col("rk")) * dec38(F.col("cents"))).alias("sxr"),
    )
    n, sx, sxr = dec38(F.col("n")), dec38(F.col("sx")), F.col("sxr")
    num = dec38(F.lit(2)) * sxr - (n + dec38(F.lit(1))) * sx
    den = n * sx
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("total_cents"),
        _int_div(dec38(F.lit(2_000_000)) * num + den, dec38(F.lit(2)) * den)
        .cast("long")
        .alias("gini_ppm"),
    )


@_q(
    "q143_image_phash_pairs",
    """
    WITH d AS (
        SELECT doc_id, text, length(text) AS len
        FROM documents WHERE length(text) > 0
    ),
    base AS (
        SELECT d.doc_id, g.i,
               ascii(substr(d.text, ((g.i % d.len) + 1)::INT, 1)) % 256 AS p
        FROM d CROSS JOIN (SELECT unnest(range(0, 1024)) AS i) g
    ),
    px AS (
        SELECT doc_id * 10 + v AS img, i,
               CASE v WHEN 0 THEN p WHEN 1 THEN (p + 9) % 256
                      WHEN 2 THEN CASE WHEN i IN (0, 131, 262, 393, 524)
                                       THEN (p + 128) % 256 ELSE p END
                      ELSE 255 - p END AS pv
        FROM base CROSS JOIN (SELECT unnest(range(0, 4)) AS v) vv
    ),
    blk AS (
        SELECT img, (i // 32 // 4) * 8 + ((i % 32) // 4) AS b, sum(pv) AS s
        FROM px GROUP BY 1, 2
    ),
    tot AS (SELECT img, sum(s) AS t FROM blk GROUP BY 1),
    ph AS (
        SELECT blk.img,
               CAST(sum(CASE WHEN s * 64 > t THEN
                    CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
                         ELSE (1::BIGINT << b::INT) END
                    ELSE 0 END) AS BIGINT) AS phash
        FROM blk JOIN tot USING (img) GROUP BY 1
    ),
    bands AS (
        SELECT img, phash, band, (phash >> (band * 8)) & 255 AS val
        FROM ph, (SELECT unnest(range(0, 8)) AS band) u
    )
    SELECT DISTINCT x.img AS img_a, y.img AS img_b,
           CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.val = y.val AND x.img < y.img
    WHERE bit_count(xor(x.phash, y.phash)) <= 6
    """,
    "Image near-duplicate pair search over REAL decoded pixels: a "
    "deterministic PNG corpus derived from documents (4 variants per "
    "doc — base, brightness-shifted, 5-hot-pixel edit, inverted; "
    "multimodal.synthetic_image_corpus), REALLY encoded and decoded "
    "through operators.codecs, fingerprinted by the portable integer "
    "aHash (multimodal.ahash64: block-sum cross-multiply, no floats), "
    "then pigeonhole-EXACT Hamming banding shared with SimHash "
    "(dedup.hamming_banded_pairs, radius 6 over 8 bands). The oracle "
    "reproduces every pixel — hence every fingerprint — analytically "
    "from the text, so hash parity verifies the encode->decode->hash "
    "path end-to-end: brightness variants land at hamming 0 (aHash's "
    "invariance, exact by the cross-multiply construction), hot-pixel "
    "edits at <= 5, inversions are never paired.",
)
def q143_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents")
    imgs = MM.synthetic_image_corpus(docs)
    pairs = MM.image_near_dup_pairs(imgs, max_hamming=6, n_bands=8)
    return pairs.select(
        F.col("doc_a").alias("img_a"),
        F.col("doc_b").alias("img_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


@_q(
    "q144_quantile_sketch",
    """
    WITH vals AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
        FROM lineitem
    ),
    b AS (
        SELECT l_returnflag,
               (CAST(greatest(0, length(bin(v)) - 8) AS BIGINT) << 7)
                 + (v >> greatest(0, length(bin(v)) - 8)) AS bucket
        FROM vals
    ),
    sk AS (
        SELECT l_returnflag, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY l_returnflag, bucket
    ),
    c AS (
        SELECT l_returnflag, bucket, cnt,
               CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows
        FROM sk
    ),
    e AS (
        SELECT c.*, CAST(q.q_ppm AS BIGINT) AS q_ppm
        FROM c CROSS JOIN (SELECT unnest([500000, 900000, 990000]) AS q_ppm) q
    ),
    p AS (
        SELECT l_returnflag, q_ppm,
               CAST(
                 (bucket - (greatest(0, (bucket >> 7) - 1) << 7))
                   << greatest(0, (bucket >> 7) - 1)
                 AS BIGINT) AS est_cents,
               n_rows
        FROM e
        WHERE cum >= (n_rows * q_ppm + 999999) // 1000000
          AND cum - cnt < (n_rows * q_ppm + 999999) // 1000000
    )
    SELECT * FROM p ORDER BY l_returnflag, q_ppm
    """,
    "Mergeable quantile sketch (operators.sketches.quantile_sketch / "
    "quantile_estimate): HDR-histogram-style base-2 grid over "
    "l_extendedprice in exact cents, p50/p90/p99 per return flag. "
    "Bucketing is pure integer expressions (bitlen via length(bin(v))"
    " — no engine-private log), so the sketch contents AND the "
    "estimates are bit-identical cross-engine; the sketch is "
    "additive per (group, bucket), so refresh_additive_agg / "
    "stream_additive_agg_to_table maintain it as an MV with no new "
    "machinery (merge law pinned in tests). Relative error <= 2^-7",
)
def q144_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    # 2-decimal doubles lift to exact integer cents (the round-5
    # float-discipline rule: sums/ranks on the 0.01 grid are
    # boundary-free once integers)
    vals = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
    )
    sk = quantile_sketch(vals, "v", ["l_returnflag"])
    est = quantile_estimate(sk, ["l_returnflag"])
    return est.select(
        "l_returnflag",
        "q_ppm",
        F.col("est").alias("est_cents"),
        "n_rows",
    ).orderBy("l_returnflag", "q_ppm")


@_q(
    "q145_url_canonical_dedup",
    r"""
    WITH raw AS (
        SELECT doc_id * 10 + v AS raw_id,
               CASE v
                 WHEN 0 THEN 'https://' || source || '.example.com/doc/'
                             || CAST(doc_id % 40 AS VARCHAR)
                             || '?id=' || CAST(doc_id % 40 AS VARCHAR)
                 WHEN 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.COM:443/doc/'
                             || CAST(doc_id % 40 AS VARCHAR)
                             || '/?id=' || CAST(doc_id % 40 AS VARCHAR)
                             || '&utm_source=feed'
                 ELSE 'https://' || source || '.example.com//doc//'
                             || CAST(doc_id % 40 AS VARCHAR)
                             || '?utm_campaign=x&id=' || CAST(doc_id % 40 AS VARCHAR)
               END AS url
        FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS v)
    ),
    t AS (SELECT raw_id, trim(url) AS u FROM raw),
    parts AS (
        SELECT raw_id,
            lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS lscheme,
            regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\-]*://', '') AS rest,
            -- non-greedy prefix anchors '?' BEFORE any fragment, as
            -- in functions.url._url_parts
            regexp_extract(u, '^[^#]*?\?([^#]*)', 1) AS query
        FROM t
    ),
    p2 AS (
        SELECT raw_id, lscheme,
            lower(regexp_extract(rest, '^([^/?#]*)', 1)) AS host0,
            regexp_extract(rest, '^[^/?#]*([^?#]*)', 1) AS path0,
            query
        FROM parts
    ),
    p3 AS (
        SELECT raw_id, lscheme,
            CASE WHEN lscheme = 'http'  THEN regexp_replace(host0, ':80$', '')
                 WHEN lscheme = 'https' THEN regexp_replace(host0, ':443$', '')
                 ELSE host0 END AS host,
            -- NOTE 'g': DuckDB regexp_replace is FIRST-match unless
            -- flagged global; Spark's is always global
            CASE WHEN regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'),
                                     '/$', '') = ''
                 THEN '/'
                 ELSE regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'),
                                     '/$', '') END AS npath,
            coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
                p -> p <> '' AND NOT starts_with(p, 'utm_')
                     AND NOT starts_with(p, 'gclid=')
                     AND NOT starts_with(p, 'fbclid=')
                     AND NOT starts_with(p, 'ref='))), '&'), '') AS qs
        FROM p2
    ),
    canon AS (
        SELECT raw_id,
            (CASE WHEN lscheme = '' THEN '' ELSE lscheme || '://' END)
            || host || npath
            || (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canonical_url
        FROM p3
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_raw,
           min(raw_id) AS keep_id
    FROM canon GROUP BY canonical_url
    ORDER BY canonical_url
    """,
    "Canonical-URL dedup (functions.url.canonical_url + url_dedup): "
    "the crawl-pipeline tier that collapses refetches BEFORE any "
    "content hashing. Raw fetches derived deterministically from "
    "documents (three messy variants per doc: cased host + default "
    "port + trailing slash + utm params + doubled slashes + shuffled "
    "param order), canonicalized by pure regexp/array expressions "
    "that Java regex and RE2 evaluate identically, grouped on the "
    "canonical string with keep-min-id survivorship. The oracle "
    "replays the construction AND the canonicalization in SQL — "
    "pitfall encoded: DuckDB regexp_replace needs the 'g' flag where "
    "Spark replaces globally",
)
def q145_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.functions.url import url_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    page = (F.col("doc_id") % 40).cast("string")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    v0 = F.concat(
        F.lit("https://"), host, F.lit("/doc/"), page, F.lit("?id="), page
    )
    v1 = F.concat(
        F.lit("HTTPS://"),
        F.upper(host),
        F.lit(":443/doc/"),
        page,
        F.lit("/?id="),
        page,
        F.lit("&utm_source=feed"),
    )
    v2 = F.concat(
        F.lit("https://"),
        host,
        F.lit("//doc//"),
        page,
        F.lit("?utm_campaign=x&id="),
        page,
    )
    raw = docs.select(
        "doc_id", F.posexplode(F.array(v0, v1, v2)).alias("v", "url")
    ).select((F.col("doc_id") * 10 + F.col("v")).alias("raw_id"), "url")
    return url_dedup(raw, "url", "raw_id").orderBy("canonical_url")


@_q(
    "q146_winsorize_by_sketch",
    """
    WITH vals AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
        FROM lineitem
    ),
    b AS (
        SELECT l_returnflag,
               (CAST(greatest(0, length(bin(v)) - 8) AS BIGINT) << 7)
                 + (v >> greatest(0, length(bin(v)) - 8)) AS bucket
        FROM vals
    ),
    sk AS (
        SELECT l_returnflag, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY l_returnflag, bucket
    ),
    c AS (
        SELECT l_returnflag, bucket, cnt,
               CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_total
        FROM sk
    ),
    lo AS (
        SELECT l_returnflag,
               CAST((bucket - (greatest(0, (bucket >> 7) - 1) << 7))
                      << greatest(0, (bucket >> 7) - 1) AS BIGINT) AS p_lo,
               cum - cnt AS n_below, n_total
        FROM c
        WHERE cum >= (n_total * 10000 + 999999) // 1000000
          AND cum - cnt < (n_total * 10000 + 999999) // 1000000
    ),
    hi AS (
        SELECT l_returnflag,
               CAST((bucket - (greatest(0, (bucket >> 7) - 1) << 7))
                      << greatest(0, (bucket >> 7) - 1) AS BIGINT) AS p_hi,
               n_total - cum AS n_above
        FROM c
        WHERE cum >= (n_total * 990000 + 999999) // 1000000
          AND cum - cnt < (n_total * 990000 + 999999) // 1000000
    )
    SELECT lo.l_returnflag, p_lo, p_hi, n_below, n_above, n_total
    FROM lo JOIN hi ON lo.l_returnflag = hi.l_returnflag
    ORDER BY lo.l_returnflag
    """,
    "Sketch-path winsorization report (operators.expectations."
    "winsorize_bounds_by_sketch): p1/p99 clip bounds AND exact tail "
    "counts for those bounds, all read off the mergeable quantile "
    "sketch — ONE scan of the fact total, vs the exact version's "
    "percentile sort + broadcast re-scan; maintainable incrementally "
    "as an MV because the sketch is additive. Bounds are bucket "
    "lower edges (integer cents, within 2^-7 of the exact rank "
    "statistic — band pinned in tests); every quantity integer, "
    "bit-identical cross-engine",
)
def q146_winsorize_by_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.expectations import (
        winsorize_bounds_by_sketch,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    vals = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
    )
    return winsorize_bounds_by_sketch(
        vals, "v", ["l_returnflag"], lower_ppm=10_000, upper_ppm=990_000
    ).orderBy("l_returnflag")


@_q(
    "q147_containment_pairs",
    f"""
    WITH {_NGRAM_SET_CTES},
    co AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(c * 1.0 / least(sa.s, sb.s), 6) AS containment
    FROM co
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE c * 1000000 >= 800000 * least(sa.s, sb.s)
    ORDER BY doc_a, doc_b
    """,
    "Set-containment near-dup pairs (operators.dedup."
    "containment_pairs): |A∩B| / min(|A|,|B|) >= 0.8 over capped "
    "3-gram shingle sets — the subset-duplication detector Jaccard "
    "structurally misses (doc embedded in a 10x larger one: Jaccard "
    "~0.1, containment 1.0). EXACT via prefix filtering (Chaudhuri "
    "2006 / PPJoin): probe each doc's rarest sz-ceil(t*sz)+1 "
    "shingles against the inverted index (completeness: any "
    "qualifying overlap intersects the smaller doc's prefix in any "
    "global order), verify candidates with the exact intersection "
    "count, threshold as an integer cross-multiply. The oracle runs "
    "the brute-force all-pairs join — equality IS the no-false-"
    "negatives proof of the filter",
)
def q147_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.containment_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold_ppm=800_000,
        max_shingle_df=64,
    ).orderBy("doc_a", "doc_b")


@_q(
    "q148_quantile_mv",
    """
    WITH vals AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
        FROM events
    ),
    b AS (
        SELECT event_type,
               (CAST(greatest(0, length(bin(v)) - 8) AS BIGINT) << 7)
                 + (v >> greatest(0, length(bin(v)) - 8)) AS bucket
        FROM vals
    ),
    sk AS (
        SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY event_type, bucket
    ),
    c AS (
        SELECT event_type, bucket, cnt,
               CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_rows
        FROM sk
    ),
    e AS (
        SELECT c.*, CAST(q.q_ppm AS BIGINT) AS q_ppm
        FROM c CROSS JOIN (SELECT unnest([500000, 900000, 990000]) AS q_ppm) q
    )
    SELECT event_type, q_ppm,
           CAST((bucket - (greatest(0, (bucket >> 7) - 1) << 7))
                  << greatest(0, (bucket >> 7) - 1) AS BIGINT) AS est_cents,
           n_rows
    FROM e
    WHERE cum >= (n_rows * q_ppm + 999999) // 1000000
      AND cum - cnt < (n_rows * q_ppm + 999999) // 1000000
    ORDER BY event_type, q_ppm
    """,
    "Per-event-type value-percentile MATERIALIZED VIEW maintained "
    "incrementally by additive quantile-sketch folds "
    "(refresh_additive_agg over sketches.quantile_sketch — the q136 "
    "pattern for the ADDITIVE corner of the maintenance matrix): two "
    "half-batches folded with replay-ledgered exactly-once, then "
    "p50/p90/p99 read off the stored buckets. The ORACLE is the "
    "direct full-data bucket walk — hash-green IS "
    "refresh(sk(A), sk(B)) = sk(A ∪ B) end-to-end.",
)
def q148_quantile_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dataflow_python_etl_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )
    from dataflow_python_etl_spark.operators.upsert import refresh_additive_agg

    # ONE MV per sf_dir per process (the q128/q136 memoization rule)
    path = _QUANTILE_MV_CACHE.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="quantile_mv_") + "/mv"
        ev = _t(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        for parity in (0, 1):
            batch = ev.where(F.col("event_id") % 2 == parity)
            refresh_additive_agg(
                spark,
                path,
                quantile_sketch(batch, "v", ["event_type"]),
                ["event_type", "bucket"],
                batch_id=parity,
            )
        _QUANTILE_MV_CACHE[sf_dir] = path
    mv = spark.read.parquet(path)
    return quantile_estimate(mv, ["event_type"]).select(
        "event_type", "q_ppm", F.col("est").alias("est_cents"), "n_rows"
    ).orderBy("event_type", "q_ppm")


_QUANTILE_MV_CACHE: dict = {}


@_q(
    "q149_quantile_rollup",
    """
    WITH vals AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
        FROM lineitem
    ),
    b AS (
        SELECT l_returnflag,
               (CAST(greatest(0, length(bin(v)) - 8) AS BIGINT) << 7)
                 + (v >> greatest(0, length(bin(v)) - 8)) AS bucket
        FROM vals
    ),
    sk AS (
        SELECT l_returnflag, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY l_returnflag, bucket
    ),
    rolled AS (
        SELECT l_returnflag AS scope, bucket, cnt FROM sk
        UNION ALL
        SELECT '<all>' AS scope, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
        FROM sk GROUP BY bucket
    ),
    c AS (
        SELECT scope, bucket, cnt,
               CAST(sum(cnt) OVER (PARTITION BY scope ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY scope) AS BIGINT) AS n_rows
        FROM rolled
    ),
    e AS (
        SELECT c.*, CAST(q.q_ppm AS BIGINT) AS q_ppm
        FROM c CROSS JOIN (SELECT unnest([500000, 990000]) AS q_ppm) q
    )
    SELECT scope, q_ppm,
           CAST((bucket - (greatest(0, (bucket >> 7) - 1) << 7))
                  << greatest(0, (bucket >> 7) - 1) AS BIGINT) AS est_cents,
           n_rows
    FROM e
    WHERE cum >= (n_rows * q_ppm + 999999) // 1000000
      AND cum - cnt < (n_rows * q_ppm + 999999) // 1000000
    ORDER BY scope, q_ppm
    """,
    "Quantile ROLLUP off one sketch (sketches.quantile_sketch + "
    "quantile_estimate): per-return-flag AND corpus-global p50/p99 "
    "from the SAME per-group sketch table — the cross-group corner "
    "of the sketch's merge algebra (global buckets = per-group "
    "buckets summed; a percentile MV answers every coarser grain "
    "without re-reading facts, which an exact percentile never can). "
    "The global rows' hash-match against the direct full-data walk "
    "IS the cross-group merge law. Rollup input is the grid-bounded "
    "sketch, so the extra grain costs bucket-table work only",
)
def q149_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    vals = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
    )
    sk = quantile_sketch(vals, "v", ["l_returnflag"])
    # cross-group rollup ON THE SKETCH: global buckets are the
    # per-group buckets summed (additivity again — never the facts)
    rolled = sk.select(
        F.col("l_returnflag").alias("scope"), "bucket", "cnt"
    ).unionByName(
        sk.groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .select(F.lit("<all>").alias("scope"), "bucket", "cnt")
    )
    est = quantile_estimate(rolled, ["scope"], quantiles_ppm=(500_000, 990_000))
    return est.select(
        "scope", "q_ppm", F.col("est").alias("est_cents"), "n_rows"
    ).orderBy("scope", "q_ppm")


@_q(
    "q150_audio_fingerprint_pairs",
    """
    WITH d AS (
        SELECT doc_id, text, length(text) AS len
        FROM documents WHERE length(text) > 0
    ),
    px AS (
        SELECT d.doc_id * 10 + vv.v AS aid, g.i,
               CASE vv.v
                 WHEN 1 THEN 4 * (ascii(substr(d.text,
                        ((g.i % d.len) + 1)::INT, 1)) % 256 - 128)
                 WHEN 2 THEN ascii(substr(d.text,
                        (((CASE WHEN g.i // 32 = 13 THEN g.i + 768
                                WHEN g.i // 32 = 37 THEN g.i - 768
                                ELSE g.i END) % d.len) + 1)::INT, 1))
                        % 256 - 128
                 WHEN 3 THEN ascii(substr(d.text,
                        (((g.i + 997) % d.len) + 1)::INT, 1)) % 256 - 128
                 ELSE ascii(substr(d.text,
                        ((g.i % d.len) + 1)::INT, 1)) % 256 - 128
               END AS s
        FROM d CROSS JOIN (SELECT unnest(range(0, 2048)) AS i) g
             CROSS JOIN (SELECT unnest(range(0, 4)) AS v) vv
    ),
    wn AS (
        SELECT aid, i // 32 AS w, sum(s * s) AS e FROM px GROUP BY 1, 2
    ),
    ph AS (
        SELECT a.aid,
               CAST(sum(CASE WHEN a.e > b.e THEN
                    CASE WHEN a.w = 63 THEN (-9223372036854775807 - 1)
                         ELSE (1::BIGINT << a.w::INT) END
                    ELSE 0 END) AS BIGINT) AS phash
        FROM wn a JOIN wn b
          ON a.aid = b.aid AND b.w = (a.w + 1) % 64
        GROUP BY 1
    ),
    bands AS (
        SELECT aid, phash, band, (phash >> (band * 8)) & 255 AS val
        FROM ph, (SELECT unnest(range(0, 8)) AS band) u
    )
    SELECT DISTINCT x.aid AS clip_a, y.aid AS clip_b,
           CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.val = y.val AND x.aid < y.aid
    WHERE bit_count(xor(x.phash, y.phash)) <= 6
    """,
    "Audio near-duplicate pair search over REAL decoded samples: a "
    "deterministic 16-bit PCM WAV corpus derived from documents (4 "
    "variants per doc — base, gain x4, one window-pair content swap, "
    "a far clip tiled from offset 997; "
    "multimodal.synthetic_audio_corpus), REALLY encoded and decoded "
    "through operators.codecs, fingerprinted by the portable integer "
    "energy-profile hash (multimodal.audio_fingerprint64: strict "
    "successive-window energy comparisons, circular, no floats — the "
    "Chromaprint-family shape; global-mean thresholding measured 6% "
    "of ALL cross-clip pairs inside radius 6 on this corpus and was "
    "rejected), then pigeonhole-EXACT Hamming banding shared with "
    "SimHash and the image tier (dedup.hamming_banded_pairs, radius "
    "6 over 8 bands). The oracle reproduces every sample — hence "
    "every fingerprint — analytically from the text, so hash parity "
    "verifies the encode->decode->fingerprint path end-to-end: gain "
    "variants land at hamming 0 (a strict comparison is unmoved by "
    "g^2), the window swap at <= 4 (each energy feeds exactly two "
    "difference bits), far clips are never paired.",
)
def q150_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents")
    clips = MM.synthetic_audio_corpus(docs)
    pairs = MM.audio_near_dup_pairs(clips, max_hamming=6, n_bands=8)
    return pairs.select(
        F.col("doc_a").alias("clip_a"),
        F.col("doc_b").alias("clip_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


@_q(
    "q151_video_frame_jaccard_pairs",
    """
    WITH d AS (
        SELECT doc_id, text, length(text) AS len
        FROM documents WHERE length(text) > 0
    ),
    px AS (
        SELECT d.doc_id, vv.v, ff.f, g.i,
               ascii(substr(d.text,
                   (((g.i + 7 * (CASE WHEN vv.v = 1 THEN 5 - ff.f
                                      ELSE ff.f END)) % d.len) + 1)::INT,
                   1)) % 256 AS p0
        FROM d CROSS JOIN (SELECT unnest(range(0, 256)) AS i) g
             CROSS JOIN (SELECT unnest(range(0, 6)) AS f) ff
             CROSS JOIN (SELECT unnest(range(0, 4)) AS v) vv
    ),
    pv AS (
        SELECT doc_id, v, f, i,
               CASE WHEN v = 3 THEN 255 - p0
                    WHEN v = 2 AND f = 5 AND i IN (0, 37, 101, 149, 255)
                    THEN (p0 + 128) % 256
                    ELSE p0 END AS p
        FROM px
    ),
    blk AS (
        SELECT doc_id, v, f,
               (i // 16 // 2) * 8 + ((i % 16) // 2) AS b, sum(p) AS s
        FROM pv GROUP BY 1, 2, 3, 4
    ),
    tot AS (SELECT doc_id, v, f, sum(s) AS t FROM blk GROUP BY 1, 2, 3),
    ph AS (
        SELECT blk.doc_id, blk.v, blk.f,
               CAST(sum(CASE WHEN s * 64 > t THEN
                    CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
                         ELSE (1::BIGINT << b::INT) END
                    ELSE 0 END) AS BIGINT) AS fh
        FROM blk JOIN tot USING (doc_id, v, f) GROUP BY 1, 2, 3
    ),
    hs AS (SELECT DISTINCT doc_id * 10 + v AS vid, fh FROM ph),
    sz AS (SELECT vid, count(*) AS n FROM hs GROUP BY 1),
    cm AS (
        SELECT x.vid AS vid_a, y.vid AS vid_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM hs x JOIN hs y ON x.fh = y.fh AND x.vid < y.vid
        GROUP BY 1, 2
    )
    SELECT cm.vid_a, cm.vid_b, cm.n_common,
           CAST((1000000 * cm.n_common) // (sa.n + sb.n - cm.n_common)
                AS BIGINT) AS jaccard_ppm
    FROM cm JOIN sz sa ON sa.vid = cm.vid_a
            JOIN sz sb ON sb.vid = cm.vid_b
    WHERE 1000000 * cm.n_common >= 500000 * (sa.n + sb.n - cm.n_common)
    """,
    "Video near-duplicate pair search by frame-hash-set Jaccard over "
    "REAL decoded frames: a deterministic animated-GIF corpus derived "
    "from documents (4 variants per doc — base, frames REVERSED, one "
    "frame hot-pixel-edited, inverted; "
    "multimodal.synthetic_video_corpus), REALLY encoded and decoded "
    "frame-by-frame through operators.codecs.decode_gif_frames, each "
    "frame fingerprinted by the portable integer aHash "
    "(multimodal.ahash64 — shared with the image tier), then pairs "
    "form ONLY where two videos SHARE a frame hash (equi-join on the "
    "hash, never all-pairs) with exact integer Jaccard "
    "((1e6*common) div union, cross-multiply threshold at 0.5). The "
    "oracle reproduces every frame hash analytically from the text, "
    "so hash parity verifies encode -> decode -> hash -> set-join "
    "end-to-end: reversed variants land at Jaccard 1.0 exactly "
    "(set semantics: re-mux/re-order must not matter), one-frame "
    "edits at >= 5/7, inverted variants are never paired.",
)
def q151_video_frame_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents")
    vids = MM.synthetic_video_corpus(docs)
    pairs = MM.video_near_dup_pairs(vids, min_jaccard_ppm=500_000)
    return pairs.select(
        "vid_a",
        "vid_b",
        F.col("n_common").cast("long").alias("n_common"),
        F.col("jaccard_ppm").cast("long").alias("jaccard_ppm"),
    )


@_q(
    "q152_audio_containment_pairs",
    """
    WITH d AS (
        SELECT doc_id, text, length(text) AS len
        FROM documents WHERE length(text) > 0
    ),
    px AS (
        SELECT d.doc_id * 10 + vv.v AS aid, g.i,
               CASE vv.v
                 WHEN 1 THEN (ascii(substr(d.text,
                        (((g.i + 1024) % d.len) + 1)::INT, 1)) * 31
                        + (g.i + 1024) * 17) % 256 - 128
                 WHEN 2 THEN ((ascii(substr(d.text,
                        ((g.i % d.len) + 1)::INT, 1)) * 7 + 13) * 31
                        + g.i * 17) % 256 - 128
                 ELSE (ascii(substr(d.text,
                        ((g.i % d.len) + 1)::INT, 1)) * 31
                        + g.i * 17) % 256 - 128
               END AS s
        FROM d CROSS JOIN (SELECT unnest(range(0, 4096)) AS i) g
             CROSS JOIN (SELECT unnest(range(0, 3)) AS v) vv
        WHERE NOT (vv.v = 1 AND g.i >= 2048)
    ),
    rh AS (
        SELECT aid, i, s,
               CASE WHEN i >= 7 THEN
                 (s * 1 + lag(s, 1) OVER w * 9 + lag(s, 2) OVER w * 20
                  + lag(s, 3) OVER w * 58 + lag(s, 4) OVER w * 34
                  + lag(s, 5) OVER w * 1 + lag(s, 6) OVER w * 9
                  + lag(s, 7) OVER w * 20) % 61 = 0
               ELSE FALSE END AS cut
        FROM px
        WINDOW w AS (PARTITION BY aid ORDER BY i)
    ),
    sg AS (
        SELECT aid, i, s,
               coalesce(sum(cut::INT) OVER (PARTITION BY aid ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS seg
        FROM rh
    ),
    pos AS (
        SELECT aid, seg, s, i,
               min(i) OVER (PARTITION BY aid, seg) AS i0,
               count(*) OVER (PARTITION BY aid, seg) AS slen
        FROM sg
    ),
    sh AS (
        SELECT aid, seg,
               ((sum(s * (((i - i0) * 2654435761 + 1) % 1000003))
                 % 1000000007) + 1000000007) % 1000000007 AS h
        FROM pos WHERE slen >= 4 GROUP BY aid, seg
    ),
    cnt AS (SELECT aid, h, count(*) AS c FROM sh GROUP BY 1, 2),
    sz AS (SELECT aid, sum(c) AS n FROM cnt GROUP BY 1),
    cm AS (
        SELECT x.aid AS clip_a, y.aid AS clip_b,
               CAST(sum(least(x.c, y.c)) AS BIGINT) AS n_common
        FROM cnt x JOIN cnt y ON x.h = y.h AND x.aid < y.aid
        GROUP BY 1, 2
    )
    SELECT cm.clip_a, cm.clip_b, cm.n_common,
           CAST((1000000 * cm.n_common) // least(sa.n, sb.n) AS BIGINT)
               AS containment_ppm
    FROM cm JOIN sz sa ON sa.aid = cm.clip_a
            JOIN sz sb ON sb.aid = cm.clip_b
    WHERE 1000000 * cm.n_common >= 600000 * least(sa.n, sb.n)
    """,
    "Audio CONTAINMENT pair search by content-defined chunking: a "
    "deterministic 16-bit PCM WAV corpus derived from documents (3 "
    "variants per doc — a 4096-sample base with the text POSITION-"
    "MIXED into every sample, its [1024,3072) TRIM, and a byte-"
    "bijection far clip; multimodal.synthetic_audio_containment_"
    "corpus), REALLY encoded and decoded through operators.codecs, "
    "cut into content-defined segments (rolling hash of the last 8 "
    "samples divisible by 61 — boundaries depend only on local "
    "content, so a trim at ANY offset reproduces its source's "
    "interior segments; the q150 global fingerprint is blind to "
    "trims because trimming shifts its fixed 64-window grid), each "
    "segment hashed by an exact-integer positional weighted sum, "
    "then MULTISET containment over shared-hash candidates only "
    "(equi-join on the hash, never all-pairs): containment_ppm = "
    "(1e6*common) div min(na,nb), cross-multiply threshold 0.6. The "
    "oracle reproduces every sample — hence every boundary, segment "
    "hash, and pair score — analytically from the text (lag-window "
    "rolling hash, prefix-sum segment ids), so hash parity verifies "
    "encode -> decode -> chunk -> hash -> multiset-join end-to-end. "
    "Constants are MEASURED (round-8 discipline): base 131 / prime "
    "divisor 61 because base 31 mod 2^k collapses to an alternating "
    "sum that produced ZERO cuts on 8/500 real documents; planted "
    "trims score >= 888888 ppm, far/cross-clip pairs never reach "
    "500000.",
)
def q152_audio_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents")
    clips = MM.synthetic_audio_containment_corpus(docs)
    return MM.audio_containment_pairs(clips, min_containment_ppm=600_000)


@_q(
    "q153_multimodal_curate",
    f"""
    WITH scrub AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                   '<EMAIL>', 'g'),
                   '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b', '<IP>', 'g'),
                   '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
                   '(?:\\+?\\d{{1,2}}[\\s.-])?\\(?\\d{{3}}\\)?[\\s.-]\\d{{3}}[\\s.-]\\d{{4}}\\b',
                   '<PHONE>', 'g'),
                   '\\b\\d{{13,19}}\\b', '<CCNUM>', 'g') AS stext
        FROM documents
    ),
    x AS (
        SELECT doc_id, stext,
               regexp_split_to_array(stext, '\\s+') AS toks,
               length(stext) AS nch,
               length(stext) - length(regexp_replace(stext, '[^\\w\\s]', '', 'g')) AS npunct
        FROM scrub
    ),
    scored AS (
        SELECT doc_id, stext,
               round(
                 least(len(toks) / 100.0, 1.0) * 0.4
                 + least((len(list_filter(toks, t -> list_contains({_STOPWORD_SQL_LIST}, t)))
                          * 1.0 / greatest(len(toks), 1)) * 5.0, 1.0) * 0.3
                 + (1.0 - least((npunct * 1.0 / greatest(nch, 1)) * 10.0, 1.0)) * 0.3,
               6) AS quality
        FROM x
    ),
    kept AS MATERIALIZED (SELECT * FROM scored WHERE quality >= 0.3),
    tok2 AS (
        SELECT doc_id, regexp_split_to_array(stext, '\\s+') AS toks FROM kept
    ),
    sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM tok2, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) u
        WHERE len(toks) >= 3
    ),
    hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 64),
    sh AS (SELECT * FROM sh0 ANTI JOIN hot USING (shingle)),
    sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
    co AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jrem AS (
        SELECT DISTINCT doc_b AS doc_id FROM co
        JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        WHERE c * 1.0 / (sa.s + sb.s - c) >= 0.5
    ),
    surv1 AS MATERIALIZED (SELECT * FROM kept ANTI JOIN jrem USING (doc_id)),
    src AS (
        SELECT doc_id, text, length(text) AS len
        FROM documents WHERE length(text) > 0
    ),
    anch AS MATERIALIZED (
        SELECT s.doc_id,
               coalesce(i.text, s.text) AS img_t, coalesce(i.len, s.len) AS img_len,
               coalesce(a.text, s.text) AS aud_t, coalesce(a.len, s.len) AS aud_len,
               coalesce(v.text, s.text) AS vid_t, coalesce(v.len, s.len) AS vid_len
        FROM src s
        LEFT JOIN src i ON i.doc_id = s.doc_id - (s.doc_id % 2)
        LEFT JOIN src a ON a.doc_id = s.doc_id
            - (CASE WHEN s.doc_id % 3 = 2 THEN 2 ELSE 0 END)
        LEFT JOIN src v ON v.doc_id = s.doc_id
            - (CASE WHEN s.doc_id % 5 = 4 THEN 4 ELSE 0 END)
    ),
    ipx AS (
        SELECT n.doc_id, g.i,
               ascii(substr(n.img_t, ((g.i % n.img_len) + 1)::INT, 1)) % 256 AS p
        FROM anch n JOIN surv1 USING (doc_id)
        CROSS JOIN (SELECT unnest(range(0, 256)) AS i) g
    ),
    iblk AS (
        SELECT doc_id, (i // 16 // 2) * 8 + ((i % 16) // 2) AS b, sum(p) AS s
        FROM ipx GROUP BY 1, 2
    ),
    itot AS (SELECT doc_id, sum(s) AS t FROM iblk GROUP BY 1),
    ih AS MATERIALIZED (
        SELECT iblk.doc_id,
               CAST(sum(CASE WHEN s * 64 > t THEN
                    CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
                         ELSE (1::BIGINT << b::INT) END
                    ELSE 0 END) AS BIGINT) AS h
        FROM iblk JOIN itot USING (doc_id) GROUP BY 1
    ),
    irem AS (
        SELECT DISTINCT y.doc_id FROM ih x
        JOIN ih y ON x.doc_id < y.doc_id AND bit_count(xor(x.h, y.h)) <= 6
    ),
    surv2 AS MATERIALIZED (SELECT * FROM surv1 ANTI JOIN irem USING (doc_id)),
    apx AS (
        SELECT n.doc_id, g.i,
               ascii(substr(n.aud_t, ((g.i % n.aud_len) + 1)::INT, 1)) % 256 - 128 AS s
        FROM anch n JOIN surv2 USING (doc_id)
        CROSS JOIN (SELECT unnest(range(0, 2048)) AS i) g
    ),
    awn AS (SELECT doc_id, i // 32 AS w, sum(s * s) AS e FROM apx GROUP BY 1, 2),
    ah AS MATERIALIZED (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN a.e > b.e THEN
                    CASE WHEN a.w = 63 THEN (-9223372036854775807 - 1)
                         ELSE (1::BIGINT << a.w::INT) END
                    ELSE 0 END) AS BIGINT) AS h
        FROM awn a JOIN awn b ON a.doc_id = b.doc_id AND b.w = (a.w + 1) % 64
        GROUP BY 1
    ),
    arem AS (
        SELECT DISTINCT y.doc_id FROM ah x
        JOIN ah y ON x.doc_id < y.doc_id AND bit_count(xor(x.h, y.h)) <= 6
    ),
    surv3 AS MATERIALIZED (SELECT * FROM surv2 ANTI JOIN arem USING (doc_id)),
    vpx AS (
        SELECT n.doc_id, ff.f, g.i,
               ascii(substr(n.vid_t,
                   (((g.i + 7 * ff.f) % n.vid_len) + 1)::INT, 1)) % 256 AS p
        FROM anch n JOIN surv3 USING (doc_id)
        CROSS JOIN (SELECT unnest(range(0, 256)) AS i) g
        CROSS JOIN (SELECT unnest(range(0, 6)) AS f) ff
    ),
    vblk AS (
        SELECT doc_id, f, (i // 16 // 2) * 8 + ((i % 16) // 2) AS b, sum(p) AS s
        FROM vpx GROUP BY 1, 2, 3
    ),
    vtot AS (SELECT doc_id, f, sum(s) AS t FROM vblk GROUP BY 1, 2),
    vph AS (
        SELECT vblk.doc_id, vblk.f,
               CAST(sum(CASE WHEN s * 64 > t THEN
                    CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
                         ELSE (1::BIGINT << b::INT) END
                    ELSE 0 END) AS BIGINT) AS fh
        FROM vblk JOIN vtot USING (doc_id, f) GROUP BY 1, 2
    ),
    vhs AS MATERIALIZED (SELECT DISTINCT doc_id, fh FROM vph),
    vsz AS (SELECT doc_id, count(*) AS n FROM vhs GROUP BY 1),
    vco AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
        FROM vhs x JOIN vhs y ON x.fh = y.fh AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    ),
    vrem AS (
        SELECT DISTINCT doc_b AS doc_id FROM vco
        JOIN vsz sa ON sa.doc_id = doc_a JOIN vsz sb ON sb.doc_id = doc_b
        WHERE 1000000 * c >= 500000 * (sa.n + sb.n - c)
    ),
    surv4 AS MATERIALIZED (SELECT * FROM surv3 ANTI JOIN vrem USING (doc_id))
    SELECT doc_id, stext AS text, quality,
           CAST(len(regexp_split_to_array(stext, '\\s+')) AS BIGINT) AS n_tokens
    FROM surv4
    """,
    "FLAGSHIP multimodal curation: the full curate_corpus pipeline — "
    "PII scrub -> quality gate -> 3-gram Jaccard dedup -> image "
    "near-dup tier -> audio near-dup tier -> video near-dup tier — "
    "over one REAL payload per modality per document "
    "(multimodal.synthetic_multimodal_payloads: PNG/WAV/GIF actually "
    "encoded and decoded through operators.codecs), with cross-doc "
    "dups planted by anchor mapping: image pairs (2k,2k+1) identical, "
    "audio pairs (3k,3k+2) via a x2 GAIN copy (fingerprint invariant "
    "by construction), video pairs (5k,5k+4) via REVERSED frames "
    "(hash-set identity). The oracle reproduces every tier "
    "analytically — scrub regexes (global-flag pitfall honored), "
    "quality formula, shingle Jaccard, and all three fingerprints "
    "from anchor text — chaining survivors sequentially exactly as "
    "the operator prunes (each decode tier only sees prior "
    "survivors), with banding replaced by all-pairs comparison "
    "(equivalent BECAUSE banding is pigeonhole-exact). Hash parity "
    "therefore pins the entire multimodal matrix composed in one "
    "lazy plan.",
)
def q153_multimodal_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators import multimodal as MM
    from dataflow_python_etl_spark.operators.corpus import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    # three tiers each consume the payload frame — registered persist
    # so the encode kernel runs once (and bench can reclaim it)
    pay = DD.register_cache(MM.synthetic_multimodal_payloads(docs))
    out = curate_corpus(
        docs,
        images=pay.select("doc_id", F.col("image").alias("payload")),
        audio=pay.select("doc_id", F.col("clip").alias("payload")),
        videos=pay.select("doc_id", F.col("video").alias("payload")),
    )
    return out.select(
        "doc_id",
        "text",
        "quality",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def _pq_grid_oracle_sql(
    dim: int = 64, m: int = 32, levels: int = 8, lo: float = -1.0, hi: float = 1.0
) -> str:
    """Mirror similarity.pq_grid_codes in SQL: the grid is data-
    independent, so every digit is closed-form arithmetic over the
    raw embedding — floor/clamp of correctly-rounded double ops that
    both engines compute bit-identically (the step 0.25 even divides
    exactly). Codes are exact integers, so the hash check is
    boundary-free by construction."""
    dsub = dim // m
    step = (hi - lo) / levels

    def digit(i1: int) -> str:
        return (
            f"least(greatest(floor((ve[{i1}] - ({lo!r})) / {step!r}), 0), "
            f"{levels - 1})::BIGINT"
        )

    codes = []
    for mi in range(m):
        expr = None
        for j in range(dsub):
            d = digit(mi * dsub + j + 1)
            expr = d if expr is None else f"({expr} * {levels} + {d})"
        codes.append(expr)
    code_str = " || ',' || ".join(f"({c})::VARCHAR" for c in codes)
    code_sum = " + ".join(f"({c})" for c in codes)
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    )
    SELECT vec_id,
           {code_str} AS pq_codes,
           CAST({code_sum} AS BIGINT) AS code_sum
    FROM v
    """


@_q(
    "q154_pq_grid_codes",
    _pq_grid_oracle_sql(),
    "Data-independent grid product quantization (SURVEY §8.1): every "
    "64-dim embedding encoded to 32 tinyint codes — per 2-dim "
    "subspace, the row-major cell index on an 8-level grid over "
    "[-1, 1) (fit_pq_grid_codebooks / pq_grid_codes). Unlike the "
    "fitted Lloyd codebooks (q39's IVF ecosystem), the grid needs no "
    "training data, so the encoder has a closed form the oracle "
    "reproduces bit-for-bit: digit = clamp(floor((x+1)/0.25), 0, 7) "
    "is one correctly-rounded subtract + one EXACT power-of-two "
    "division + floor, identical on any IEEE engine — the full "
    "cross-engine hash check a trained-k-means PQ cannot have. Codes "
    "are append-stable (never retrain-stale) and half SQ8's bytes; "
    "the same codebooks drop into build_ivf_index(quantize='pq'). "
    "Pure JVM map-side expressions, no shuffle.",
)
def q154_pq_grid_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    codes = SIM.pq_grid_codes("embedding")
    return emb.select(
        "vec_id",
        F.concat_ws(",", codes.cast("array<string>")).alias("pq_codes"),
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, c: acc + c.cast("long"),
        ).alias("code_sum"),
    )


def _k_core_peel_ctes(
    k: int = 4, rounds: int = 16, e0_ctes: str | None = None
) -> str:
    """The WITH-prefix shared by q155/q160: an edge set ``e0`` plus
    ``rounds`` unrolled peel rounds ending at ``e{rounds}`` — the
    PageRank loop ≡ unrolled discipline, valid because peeling is
    monotone (post-fixpoint rounds are no-ops) while the Spark side
    early-exits at the SAME fixpoint under a raise_error convergence
    guard. ``e0_ctes`` (a full ``WITH ... e0 AS (...)`` prefix)
    defaults to q155's hash-sparsified co-purchase graph; q160
    passes its brand-blocked variant. Degrees are exact integers;
    the keep-tests are integer cross-multiplies over the portable
    md5 hash, so the whole prefix is float-free. Every iterated CTE
    is AS MATERIALIZED (round-8 pitfall: DuckDB CTEs re-expand per
    reference, and each round references the prior frame multiple
    times)."""
    h = _md5h60_sql("'kcore-v1:' || a || ':' || b")
    sql = [
        e0_ctes
        if e0_ctes is not None
        else f"""
    WITH de AS MATERIALIZED (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    st AS MATERIALIZED (
        SELECT (SELECT count(*) FROM de) AS ne,
               (SELECT count(*) FROM (SELECT DISTINCT n FROM (
                    SELECT a AS n FROM de UNION ALL SELECT b FROM de))) AS nn
    ),
    e0 AS MATERIALIZED (
        SELECT a, b FROM de, st
        WHERE ({h} % 1000000) * ne < 3000000 * nn
    )"""
    ]
    for r in range(1, rounds + 1):
        sql.append(
            f""",
    d{r} AS MATERIALIZED (
        SELECT n, count(*) AS d FROM (
            SELECT a AS n FROM e{r - 1} UNION ALL SELECT b FROM e{r - 1}
        ) GROUP BY n
    ),
    e{r} AS MATERIALIZED (
        SELECT e.a, e.b FROM e{r - 1} e
        JOIN d{r} da ON e.a = da.n JOIN d{r} db ON e.b = db.n
        WHERE da.d >= {k} AND db.d >= {k}
    )"""
        )
    return "".join(sql)


def _k_core_oracle_sql(k: int = 4, rounds: int = 16) -> str:
    return (
        _k_core_peel_ctes(k, rounds)
        + f"""
    SELECT n AS node, CAST(count(*) AS BIGINT) AS core_degree FROM (
        SELECT a AS n FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
    ) GROUP BY n
    """
    )


@_q(
    "q155_k_core",
    _k_core_oracle_sql(),
    "k-core decomposition (graph degeneracy peel, Seidman 1983) of "
    "the hash-sparsified part co-purchase graph: nodes of the 4-core "
    "with their induced degree. The dense co-purchase graph (min "
    "degree ~50) is first sparsified to mean degree ~6 by a "
    "DATA-DERIVED keep rate — edge survives iff (portable md5 of "
    "'kcore-v1:a:b' mod 1e6) * n_edges < 3e6 * n_nodes, an exact "
    "integer cross-multiply both engines share — which makes the "
    "peel cascade nontrivial (measured 3/6/9 rounds to fixpoint at "
    "sf0.001/0.01/0.1). operators.graph.k_core peels under a 16-round "
    "hard cap (each round references the prior frame 5x, so the plan "
    "tree is exponential without truncation — eager localCheckpoint "
    "EVERY round) and EARLY-EXITS one round after the edge count "
    "stabilizes, riding a count() on the frame the round just "
    "checkpointed; a filter-anchored raise_error fixpoint guard (all "
    "output degrees >= k ⟺ converged) keeps the cap loud. The oracle "
    "unrolls the full 16 rounds — valid because peeling is monotone, "
    "post-fixpoint rounds are no-ops (loop ≡ unrolled, as PageRank). "
    "Integer degrees end-to-end: no float discipline needed.",
)
def q155_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.graph import k_core

    return k_core(
        _sparse_copurchase_edges(spark, sf_dir), k=4, rounds=16, checkpoint_every=1
    )


def _sparse_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-sparsified part co-purchase graph shared by q155 and
    q160 (mirrors the ``de``/``st``/``e0`` oracle CTEs in
    :func:`_k_core_peel_ctes`): the dense co-purchase graph (min
    degree ~50) sparsified to mean degree ~6 by a DATA-DERIVED keep
    rate — edge survives iff (portable md5 of 'kcore-v1:a:b' mod
    1e6) * n_edges < 3e6 * n_nodes, an exact integer cross-multiply
    both engines share."""
    from dataflow_python_etl_spark.functions.text import md5_hash60

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )
    stats = edges.agg(F.count(F.lit(1)).cast("long").alias("ne")).crossJoin(
        edges.select(F.explode(F.array("src", "dst")).alias("n"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("nn"))
    )
    h = md5_hash60(
        F.concat(
            F.lit("kcore-v1:"),
            F.col("src").cast("string"),
            F.lit(":"),
            F.col("dst").cast("string"),
        )
    )
    return (
        edges.crossJoin(F.broadcast(stats))
        .where((h % F.lit(1_000_000)) * F.col("ne") < F.lit(3_000_000) * F.col("nn"))
        .select("src", "dst")
    )


@_q(
    "q156_dsir_selection",
    f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents
    ),
    g AS MATERIALIZED (
        SELECT doc_id,
               {_md5h60_sql("'dsir-v1:' || gram")} % 1024 AS bucket
        FROM (
            SELECT doc_id, unnest(toks) AS gram FROM tok
            UNION ALL
            SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram
            FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
            WHERE len(toks) >= 2
        )
    ),
    per_doc AS MATERIALIZED (
        SELECT g.doc_id, d.lang = 'en' AS t, bucket, count(*) AS c
        FROM g JOIN documents d ON g.doc_id = d.doc_id
        GROUP BY 1, 2, 3
    ),
    ct AS (SELECT bucket, sum(c) AS ct FROM per_doc WHERE t GROUP BY bucket),
    cs AS (SELECT bucket, sum(c) AS cs FROM per_doc GROUP BY bucket),
    st AS (
        SELECT (SELECT sum(cs) FROM cs) AS Ts,
               (SELECT coalesce(sum(ct), 0) FROM ct) AS Tt
    ),
    weights AS (
        SELECT cs.bucket,
               (1000000 * (coalesce(ct.ct, 0) + 1) * (Ts + 1024))
                   // ((cs.cs + 1) * (Tt + 1024)) AS s
        FROM cs LEFT JOIN ct ON cs.bucket = ct.bucket, st
    ),
    scores AS (
        SELECT doc_id, CAST(sum(c * s) AS BIGINT) AS dsir_score_ppm
        FROM per_doc JOIN weights USING (bucket)
        GROUP BY doc_id
    ),
    ranked AS (
        SELECT doc_id, dsir_score_ppm,
               row_number() OVER (ORDER BY dsir_score_ppm DESC, doc_id) AS rk
        FROM scores
    )
    SELECT r.doc_id, d.lang, r.dsir_score_ppm
    FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
    WHERE r.rk <= 50
    """,
    "DSIR data selection (Xie et al., NeurIPS 2023): the 50 documents "
    "whose hashed unigram+bigram profile is most target-like, target "
    "= the English slice. operators.lm.dsir_scores fits bag models "
    "for target and pool as 1024-bucket portable-md5 hashed-n-gram "
    "counts — entirely as DataFrames, one gram-volume shuffle, the "
    "<=B-row weight table broadcast — and scores each doc with the "
    "LINEARIZED exact-integer importance weight: s_f = smoothed "
    "ratio (ct+1)(Ts+B) / (cs+1)(Tt+B) in ppm via integer floor "
    "division, doc score = sum(c_f * s_f). The log-weight form is "
    "deliberately not the oracle surface (ln is engine-private at "
    "the last ulp — HLL precedent); the linear form is the "
    "first-order expansion with the same direction, and every value "
    "here is an exact integer both engines hash identically. "
    "Ranking orders by the integer score with doc_id tie-break.",
)
def q156_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.lm import dsir_scores

    docs = _t(spark, sf_dir, "documents")
    scores = dsir_scores(docs, F.col("lang") == "en")
    w = Window.orderBy(F.col("dsir_score_ppm").desc(), F.col("doc_id"))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 50)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "dsir_score_ppm")
    )


def _html_rules_sql(expr: str) -> str:
    """Apply functions.text.HTML_TEXT_RULES to a SQL expression —
    generated from the SAME module-level rule chain the Spark
    expression uses, in the same order, so the two engines cannot
    drift. Every rule carries the 'g' flag (DuckDB replaces only the
    first match otherwise — the q145 pitfall); the newline
    replacement is chr(10) because backslash escapes in a replacement
    literal are engine-ambiguous."""
    from dataflow_python_etl_spark.functions.text import HTML_TEXT_RULES

    s = expr
    for pat, rep in HTML_TEXT_RULES:
        p = pat.replace("'", "''")
        r = "chr(10)" if rep == "\n" else "'" + rep.replace("'", "''") + "'"
        s = f"regexp_replace({s}, '{p}', {r}, 'g')"
    return s


_HTML_SYNTH_SQL = """'<html><head><title>' || substr(text, 1, 16)
        || '</title><style>p{margin:0}</style><script>var x="'
        || substr(text, 17, 24) || '";</script></head><body><!-- '
        || substr(text, 9, 8) || ' --><h1>'
        || translate(substr(text, 1, 12),
                     'abcdefghijklmnopqrstuvwxyz',
                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ')
        || '</h1><p>' || substr(text, 25, 80)
        || ' &amp;amp; &lt;b&gt;</p><div class="x">' || substr(text, 105, 80)
        || '&nbsp;&#39;q&#39;</div><ul><li>' || substr(text, 185, 60)
        || '</li><li>' || substr(text, 245, 60)
        || '</li></ul></body></html>'"""


@_q(
    "q157_html_extract",
    f"""
    WITH d AS (
        SELECT doc_id, text FROM documents WHERE length(text) > 0
    ),
    h AS (
        SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM d
    ),
    e AS MATERIALIZED (
        SELECT doc_id, {_html_rules_sql('html')} AS text FROM h
    )
    SELECT doc_id, text,
           CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM e
    """,
    "HTML-to-text main-content extraction (functions.text."
    "html_to_text) — the crawl-ingest tier-0 step before any text "
    "tier: a deterministic synthetic HTML page is built from each "
    "document (title/style/script/comment/headings/paragraph/div/"
    "list, entity-laden), then extracted by the shared "
    "HTML_TEXT_RULES regexp chain (script+style+comment blocks "
    "dropped, block tags to line boundaries, remaining tags "
    "stripped, single-pass entity decode, whitespace normalized). "
    "Both engines run the IDENTICAL rule chain generated from one "
    "module-level constant (Java-regex ∩ RE2 portable subset, every "
    "DuckDB rule 'g'-flagged), so hash parity verifies the regex "
    "semantics are engine-portable end-to-end — the q145 URL-"
    "canonicalization discipline applied to markup. Pure map plan.",
)
def q157_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.functions.text import html_to_text

    docs = _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    t = F.col("text")

    def sub(pos, ln):
        return F.substring(t, pos, ln)

    html = F.concat(
        F.lit("<html><head><title>"), sub(1, 16),
        F.lit('</title><style>p{margin:0}</style><script>var x="'),
        sub(17, 24), F.lit('";</script></head><body><!-- '),
        sub(9, 8), F.lit(" --><h1>"),
        # translate, not upper(): Spark upper() is Java full/locale case
        # mapping (ß→SS, length-changing) while DuckDB's is utf8proc
        # simple mapping — they diverge on non-ASCII. An explicit
        # a-z→A-Z codepoint map is parity-by-construction either way
        # the driver regenerates the corpus (ADVICE r8).
        F.translate(
            sub(1, 12),
            "abcdefghijklmnopqrstuvwxyz",
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        ),
        F.lit("</h1><p>"), sub(25, 80),
        F.lit(' &amp;amp; &lt;b&gt;</p><div class="x">'), sub(105, 80),
        F.lit("&nbsp;&#39;q&#39;</div><ul><li>"), sub(185, 60),
        F.lit("</li><li>"), sub(245, 60),
        F.lit("</li></ul></body></html>"),
    )
    # The 13-step rule chain is the hottest expression here; three
    # sibling projections (text, n_lines, n_chars) would evaluate it
    # 3x per row (the measured N-sibling pitfall — CollapseProject
    # undoes a withColumn). A one-element explode is a Generate
    # boundary the collapser cannot merge through: the chain runs
    # once per row, the derived columns read the generated attribute.
    # The oracle mirrors with an AS MATERIALIZED CTE (ADVICE r8).
    out = html_to_text(html)
    extracted = docs.select(
        "doc_id", F.explode(F.array(out)).alias("text")
    )
    return extracted.select(
        "doc_id",
        "text",
        F.size(F.split("text", "\n")).cast("long").alias("n_lines"),
        F.length("text").cast("long").alias("n_chars"),
    )


@_q(
    "q158_hard_negatives",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS anchor_label,
               embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    c AS (
        SELECT vec_id AS neighbor_id, label AS neighbor_label,
               embedding::DOUBLE[] AS cv
        FROM embeddings
    ),
    s AS (
        SELECT query_id, anchor_label, neighbor_id, neighbor_label,
               {_cosine_sql('qv', 'cv')} AS cos_sim
        FROM q, c
        WHERE neighbor_id != query_id AND neighbor_label != anchor_label
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
        ) AS rk
        FROM s
    )
    SELECT query_id, anchor_label, neighbor_id, neighbor_label, cos_sim
    FROM r WHERE rk <= 3
    """,
    "Hard-negative mining for contrastive training "
    "(similarity.hard_negatives): for each of the first 10 anchor "
    "vectors, the 3 most cosine-similar corpus vectors with a "
    "DIFFERENT label — the ANCE-family near-miss negatives that "
    "carry the gradient signal random negatives don't. Same float "
    "discipline as q27 (anchors broadcast, one narrow corpus pass, "
    "rounded-6 scores ranked with neighbor-id tie-break), with the "
    "label-mismatch predicate inside the join so same-label pairs "
    "never materialize.",
)
def q158_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.hard_negatives(emb, emb.where(F.col("vec_id") < 10), k=3)


_PQ_RECON_SQL = (
    "list_transform({v}, x -> -1.0 + "
    "(least(greatest(floor((x - (-1.0)) / 0.25), 0), 7) + 0.5) * 0.25)"
)


@_q(
    "q159_pq_adc_topk",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    c AS (
        SELECT vec_id AS neighbor_id,
               {_PQ_RECON_SQL.format(v='embedding::DOUBLE[]')} AS rv,
               sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS cn
        FROM embeddings
    ),
    s AS (
        SELECT query_id, neighbor_id,
               round(list_inner_product(qv, rv) /
                     (sqrt(list_inner_product(qv, qv)) * cn), 6) AS adc_sim
        FROM q, c WHERE neighbor_id != query_id
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_sim DESC, neighbor_id
        ) AS rk
        FROM s
    )
    SELECT query_id, neighbor_id, adc_sim FROM r WHERE rk <= 3
    """,
    "Asymmetric-distance top-k over grid-PQ codes — the PQ SERVING "
    "path (Jegou et al. 2011's ADC) under a full value-hash oracle: "
    "each corpus vector is quantized to its grid cell and scored "
    "RECONSTRUCTED (cell center, closed form -1 + (digit+0.5)/4 — "
    "every center is an exact multiple of 0.125, so reconstruction "
    "is bit-exact cross-engine) against the full-precision query, "
    "divided by the TRUE pre-quantization norm exactly as "
    "ivf_topk_indexed's PQ branch scores its index rows. The q27 "
    "float discipline (array-order dot, rounded-6, id tie-break) "
    "then makes the whole ranking hash-stable. Quantization ties "
    "(distinct neighbors sharing a cell) are real and resolved by "
    "the id tie-break.",
)
def q159_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.functions.vectors import (
        as_double_array,
        dot,
        l2_norm,
    )

    emb = _t(spark, sf_dir, "embeddings")

    def recon(col):
        return F.transform(
            as_double_array(col),
            lambda x: F.lit(-1.0)
            + (
                F.least(
                    F.greatest(
                        F.floor((x - F.lit(-1.0)) / F.lit(0.25)), F.lit(0)
                    ),
                    F.lit(7),
                ).cast("double")
                + F.lit(0.5)
            )
            * F.lit(0.25),
        )

    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        recon("embedding").alias("rv"),
        l2_norm(as_double_array("embedding")).alias("cn"),
    )
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).withColumn(
        "adc_sim",
        F.round(dot(F.col("qv"), F.col("rv")) / (F.col("qn") * F.col("cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "adc_sim")
    )


def _brand_block_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q160's planted-partition graph (mirrors the ``de``/``bd``/
    ``nct``/``e0`` oracle CTEs in :func:`_core_communities_oracle_sql`):
    the co-purchase graph restricted to INTRA-BRAND edges (25 brand
    blocks, intra mean degree ~3.7 at every SF — the co-purchase
    densities are scale-invariant) plus a DATA-DERIVED trickle of
    cross-brand edges: a cross edge survives iff (portable md5 of
    'comm-v1:a:b' mod 1e6) * n_cross < 8e6 — expected survivors ≈ 8
    at ANY scale factor (the q155 normalization trick pointed at a
    constant instead of a mean degree), so a handful of blocks merge
    and the community structure stays plural and data-dependent
    instead of collapsing into one blob as the unblocked graph does
    (measured: the 4-core of q155's graph is ONE component at every
    SF — a random co-purchase graph has no communities to find)."""
    from dataflow_python_etl_spark.functions.text import md5_hash60

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    de = (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )
    brand = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bd = de.join(
        F.broadcast(
            brand.select(F.col("p_partkey").alias("src"), F.col("p_brand").alias("ba"))
        ),
        "src",
    ).join(
        F.broadcast(
            brand.select(F.col("p_partkey").alias("dst"), F.col("p_brand").alias("bb"))
        ),
        "dst",
    )
    intra = bd.where(F.col("ba") == F.col("bb")).select("src", "dst")
    cross = bd.where(F.col("ba") != F.col("bb"))
    nc_row = cross.agg(F.count(F.lit(1)).cast("long").alias("nc"))
    h = md5_hash60(
        F.concat(
            F.lit("comm-v1:"),
            F.col("src").cast("string"),
            F.lit(":"),
            F.col("dst").cast("string"),
        )
    )
    kept_cross = (
        cross.crossJoin(F.broadcast(nc_row))
        .where((h % F.lit(1_000_000)) * F.col("nc") < F.lit(8_000_000))
        .select("src", "dst")
    )
    return intra.unionAll(kept_cross)


_BRAND_BLOCK_E0_CTES = f"""
    WITH de AS MATERIALIZED (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    bd AS MATERIALIZED (
        SELECT de.a, de.b, pa.p_brand AS ba, pb.p_brand AS bb
        FROM de JOIN part pa ON de.a = pa.p_partkey
                JOIN part pb ON de.b = pb.p_partkey
    ),
    nct AS MATERIALIZED (SELECT count(*) AS nc FROM bd WHERE ba <> bb),
    e0 AS MATERIALIZED (
        SELECT a, b FROM bd WHERE ba = bb
        UNION ALL
        SELECT a, b FROM bd, nct
        WHERE ba <> bb
          AND ({_md5h60_sql("'comm-v1:' || a || ':' || b")} % 1000000) * nc
              < 8000000
    )"""


def _core_communities_oracle_sql(k: int = 2, peel_rounds: int = 16) -> str:
    """q160 oracle: the brand-block e0 + peel prefix, then the
    component labels as a RECURSIVE CTE — min reachable id, the
    EXACT declarative fixpoint (the q48 precedent), deliberately NOT
    an unrolled jump+min loop: a first draft unrolled 16 pointer-
    jumping rounds on the theory that reach doubles per round, and
    MEASURED convergence at sf0.01 needed 25-32 rounds (19 vs the
    true 18 communities at 16 rounds) — the doubling argument is
    WRONG for min-label flooding, because a node's current label is
    the min of its r-ball and that min's own ball need not extend
    the frontier. A fixed unroll couples the oracle to a graph-
    dependent convergence depth; the recursion does not. Reach size
    is Σ component² — fine at the gate SFs (≤ ~400-node components
    at sf0.01; the oracle never runs at sf0.1). The modularity
    arithmetic replays the operator's exact integer divisions;
    DuckDB sum() returns INT128, so outputs CAST back to BIGINT."""
    R = peel_rounds
    peel = _k_core_peel_ctes(k, R, e0_ctes=_BRAND_BLOCK_E0_CTES).replace(
        "WITH ", "WITH RECURSIVE ", 1
    )
    return peel + f""",
    sym AS MATERIALIZED (
        SELECT a AS s, b AS t FROM e{R} UNION ALL SELECT b, a FROM e{R}
    ),
    degc AS MATERIALIZED (
        SELECT s AS n, count(*) AS d FROM sym GROUP BY s
    ),
    mt AS MATERIALIZED (SELECT count(*) AS m FROM e{R}),
    reach AS (
        SELECT n AS node, n AS lab FROM degc
        UNION
        SELECT e.s AS node, r.lab
        FROM sym e JOIN reach r ON e.t = r.node
    ),
    labels AS (SELECT node, min(lab) AS lab FROM reach GROUP BY node)
    SELECT lab AS community,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(d) // 2 AS BIGINT) AS m_intra,
           CAST((1000000 * (sum(d) // 2)) // m
                - (((1000000 * sum(d)) // (2 * m))
                   * ((1000000 * sum(d)) // (2 * m))) // 1000000
                AS BIGINT) AS modularity_ppm
    FROM labels l JOIN degc ON l.node = degc.n, mt
    GROUP BY lab, m
    """


@_q(
    "q160_core_communities",
    _core_communities_oracle_sql(),
    "Community detection the oracle-able way (SURVEY §8.3 / VERDICT "
    "r8 #5): deterministic min-label propagation restricted to the "
    "2-core of the brand-blocked co-purchase graph (25 intra-brand "
    "blocks + a data-derived ~8-edge cross-brand trickle — the "
    "unblocked graph is ONE component at every SF, measured; a "
    "planted partition is what makes community detection non-vacuous "
    "on TPC-H-shaped data), plus an exact-integer Newman-Girvan "
    "modularity column. Classic mode-update LPA is tie-break-"
    "nondeterministic, so the community rule is components-of-the-"
    "core — min reachable id, a unique engine-independent FIXPOINT — "
    "computed by operators.graph.core_communities via MIN-CONTRACTION "
    "(corpus.components_contract: hook to min adjacent parent + path "
    "compression + graph contraction, ~O(log n) rounds over a "
    "geometrically shrinking edge frame, loud on non-convergence; "
    "the jump+min flood needed a measured 25-32 diameter-bound "
    "rounds here and was replaced). Modularity "
    "per community Q_c = m_c/m - (d_c/2m)^2 in ppm via three "
    "portable floor divisions whose intermediates stay under 2^63 "
    "to ~9e12 edges (the two-stage r_c = (1e6*d_c) div 2m form, not "
    "the single-division form that wraps at m~5e7); a component "
    "partition has no inter-community edges so m_c = d_sum div 2 "
    "exactly — no second edge shuffle. The oracle unrolls the peel "
    "(16 no-op-padded monotone rounds) and takes the labels from a "
    "RECURSIVE CTE — exact at any convergence depth, leaving the "
    "Spark side free to pick its algorithm.",
)
def q160_core_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.graph import core_communities

    return core_communities(_brand_block_edges(spark, sf_dir), k=2, rounds=16)


def _qclf_oracle_sql(buckets: int = 1024, epochs: int = 4) -> str:
    """Mirror operators.classifier fit+score exactly: the fixed-epoch
    full-batch perceptron unrolled (the PageRank exact-iteration-count
    precedent — both engines run the IDENTICAL epoch count, and a
    converged epoch's update sum is empty, i.e. monotone no-op
    padding), every iterated CTE MATERIALIZED (DuckDB re-expands CTEs
    per reference — round-8 pitfall). All arithmetic is exact-integer
    sums/products, so the fitted weights and held-out margins hash
    identically cross-engine."""
    gram = _md5h60_sql("'qclf-v1:' || gram")
    sql = f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
    ex AS MATERIALIZED (
        SELECT doc_id * 2 AS ex_id, CAST(1 AS BIGINT) AS y, text FROM d
        UNION ALL
        SELECT doc_id * 2 + 1, CAST(-1 AS BIGINT),
               translate(text, 'etaoins', '0123456') FROM d
    ),
    tok AS MATERIALIZED (
        SELECT ex_id, y,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> length(x) > 0) AS toks
        FROM ex
    ),
    g AS MATERIALIZED (
        SELECT ex_id, y, {gram} % {buckets} AS bucket
        FROM (
            SELECT ex_id, y, unnest(toks) AS gram FROM tok
            UNION ALL
            SELECT ex_id, y, array_to_string(toks[i:i+1], ' ') AS gram
            FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
            WHERE len(toks) >= 2
        )
    ),
    pe AS MATERIALIZED (
        SELECT ex_id, y, bucket, CAST(count(*) AS BIGINT) AS c
        FROM g GROUP BY 1, 2, 3
        UNION ALL
        SELECT DISTINCT ex_id, y, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM g
    ),
    tr AS MATERIALIZED (SELECT * FROM pe WHERE (ex_id // 2) % 5 <> 0),
    w1 AS MATERIALIZED (
        SELECT bucket, CAST(sum(y * c) AS BIGINT) AS w FROM tr GROUP BY bucket
    )"""
    for e in range(2, epochs + 1):
        p = e - 1
        sql += f""",
    mis{p} AS (
        SELECT tr.ex_id
        FROM tr LEFT JOIN w{p} USING (bucket)
        GROUP BY tr.ex_id, tr.y
        HAVING tr.y * sum(tr.c * coalesce(w{p}.w, 0)) <= 0
    ),
    u{p} AS (
        SELECT bucket, CAST(sum(y * c) AS BIGINT) AS u
        FROM tr JOIN mis{p} USING (ex_id) GROUP BY bucket
    ),
    w{e} AS MATERIALIZED (
        SELECT coalesce(w{p}.bucket, u{p}.bucket) AS bucket,
               CAST(coalesce(w{p}.w, 0) + coalesce(u{p}.u, 0) AS BIGINT) AS w
        FROM w{p} FULL JOIN u{p} ON w{p}.bucket = u{p}.bucket
    )"""
    wf = f"w{epochs}"
    sql += f""",
    summ AS (
        SELECT CAST(coalesce(sum(w) FILTER (WHERE bucket = -1), 0) AS BIGINT)
                   AS bias
        FROM {wf}
    ),
    ho AS (SELECT * FROM pe WHERE (ex_id // 2) % 5 = 0 AND bucket >= 0),
    sc AS (
        SELECT ex_id, y,
               CAST(sum(c * coalesce(w, 0)) AS BIGINT) AS m,
               CAST(sum(c) AS BIGINT) AS n_grams
        FROM ho LEFT JOIN {wf} USING (bucket)
        GROUP BY ex_id, y
    )
    SELECT ex_id, y = 1 AS label,
           CAST(m + bias AS BIGINT) AS margin, n_grams,
           m + bias > 0 AS pred
    FROM sc, summ
    """
    return sql


@_q(
    "q161_quality_classifier",
    _qclf_oracle_sql(),
    "Trained quality classifier (VERDICT r9 #1 — the fastText-style "
    "hashed-linear tier CCNet/RedPajama/Dolma all run and the "
    "heuristic gates here did not): a labeled split is built "
    "data-derived (positives = real documents, negatives = the same "
    "documents under a deterministic common-letter corruption "
    "translate(text,'etaoins','0123456') — tokens sharing no "
    "corrupted letter keep their buckets, so the classes genuinely "
    "overlap and later epochs do real corrective work), then "
    "operators.classifier.quality_classifier_fit trains a "
    "1024-bucket hashed unigram+bigram linear model (the shared "
    "_gram_buckets kernel + bias) with 4 FULL-BATCH perceptron "
    "epochs — integer, order-independent updates, the one linear "
    "trainer whose fit is bit-reproducible cross-engine (SGD is "
    "row-order-dependent, logistic needs engine-private exp/ln) — "
    "and the FROZEN weights score the held-out fifth "
    "(quality_classifier_score_with: one broadcast join + one agg, "
    "loud int64 margin guard). Output = held-out (ex_id, label, "
    "margin, n_grams, pred); the oracle unrolls the identical 4 "
    "epochs. Train-on-bounded-split / score-the-pool is exactly the "
    "100 TB posture (labels are the scarce resource).",
)
def q161_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _qclf_scored(spark, sf_dir, buckets=1024, epochs=4)


def _qclf_scored(
    spark: SparkSession, sf_dir: str, buckets: int, epochs: int
) -> DataFrame:
    """The q161 pipeline body, parameterized for q170's weaker-model
    evaluation: data-derived labeled split (positives = real docs,
    negatives = common-letter corruption), train on 4/5, score the
    held-out fifth with the frozen weights."""
    from dataflow_python_etl_spark.operators.classifier import (
        quality_classifier_fit,
        quality_classifier_score_with,
    )

    docs = _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    ex = docs.select(
        (F.col("doc_id") * 2).alias("ex_id"),
        F.lit(True).alias("label"),
        F.col("text"),
    ).unionByName(
        docs.select(
            (F.col("doc_id") * 2 + 1).alias("ex_id"),
            F.lit(False).alias("label"),
            F.translate(F.col("text"), "etaoins", "0123456").alias("text"),
        )
    )
    train = ex.where(F.expr("(ex_id div 2) % 5 <> 0"))
    hold = ex.where(F.expr("(ex_id div 2) % 5 = 0"))
    weights = quality_classifier_fit(
        train, id_col="ex_id", text_col="text", label_col="label",
        buckets=buckets, epochs=epochs,
    )
    scored = quality_classifier_score_with(
        hold, weights, id_col="ex_id", text_col="text", buckets=buckets
    )
    return scored.join(hold.select("ex_id", "label"), "ex_id").select(
        "ex_id", "label", "margin", "n_grams",
        (F.col("margin") > 0).alias("pred"),
    )


def _sql_chr_str(s: str) -> str:
    """A DuckDB string expression for ``s`` that survives any
    codepoint: printable runs stay literal (UTF-8 SQL text), control
    chars — the C1 bytes sloppy-CP1252 gremlins carry — become
    ``chr(n)`` concatenations, and single quotes double."""
    parts: list[str] = []
    run = ""
    for ch in s:
        if ch.isprintable() and ch != "'":
            run += ch
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append("''''" if ch == "'" else f"chr({ord(ch)})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts) if parts else "''"


# the q162 plant: three ASCII→unicode substitutions every synthetic
# document can carry (module-level so Spark and oracle share it)
_MOJI_PLANT: tuple[tuple[str, str], ...] = (
    ("a", "á"),   # a → á
    ("o", "ö"),   # o → ö
    (".", "…"),   # . → …
)


def _mojibake_oracle_sql() -> str:
    """Mirror functions.text.repair_mojibake exactly: the plant, the
    sloppy-CP1252 corruption, and the 123-rule repair chain are all
    generated from the SAME module constants the Spark expression
    uses (the q157 one-constant discipline), as literal nested
    replace() calls — codepoint semantics identical in both
    engines."""
    from dataflow_python_etl_spark.functions.text import MOJIBAKE_RULES

    gremlin = {ch: moji for moji, ch in MOJIBAKE_RULES}
    planted = "text"
    for src, uni in _MOJI_PLANT:
        planted = f"replace({planted}, {_sql_chr_str(src)}, {_sql_chr_str(uni)})"
    moji = planted
    for _, uni in _MOJI_PLANT:
        moji = f"replace({moji}, {_sql_chr_str(uni)}, {_sql_chr_str(gremlin[uni])})"
    repaired = "moji"
    for m, ch in MOJIBAKE_RULES:
        repaired = f"replace({repaired}, {_sql_chr_str(m)}, {_sql_chr_str(ch)})"
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
    staged AS MATERIALIZED (
        SELECT doc_id, {planted} AS planted, {moji} AS moji FROM d
    ),
    r AS (
        SELECT doc_id, planted, moji, {repaired} AS text FROM staged
    )
    SELECT doc_id, text,
           text = planted AS restored,
           CAST(length(moji) - length(text) AS BIGINT) AS n_gremlin_chars
    FROM r
    """


@_q(
    "q162_mojibake_repair",
    _mojibake_oracle_sql(),
    "Encoding-repair (mojibake) tier (VERDICT r9 #4 — the standard "
    "crawl pre-clean ahead of q157's HTML extraction): UTF-8 text "
    "read through a lenient Windows-1252 decoder turns every "
    "non-ASCII char into a 2-3 char gremlin; "
    "functions.text.repair_mojibake inverts one level of that damage "
    "with a 123-rule LITERAL replace chain generated from the byte "
    "derivation itself (sloppy-CP1252 of each codepoint's UTF-8 — "
    "the ftfy recipe), pure Catalyst, no regex, map-side only. The "
    "query plants unicode punctuation/accents into each document, "
    "corrupts them through the same byte map, repairs, and pins "
    "restored == planted per row; the oracle replays the identical "
    "three chains from the same module constants (control-char-safe "
    "chr() literals), so the repair semantics are hash-verified "
    "cross-engine end-to-end.",
)
def q162_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.functions.text import (
        MOJIBAKE_RULES,
        repair_mojibake,
    )

    gremlin = {ch: moji for moji, ch in MOJIBAKE_RULES}
    docs = _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    planted = F.col("text")
    for src, uni in _MOJI_PLANT:
        planted = F.replace(planted, F.lit(src), F.lit(uni))
    moji = planted
    for _, uni in _MOJI_PLANT:
        moji = F.replace(moji, F.lit(uni), F.lit(gremlin[uni]))
    staged = docs.select(
        "doc_id", planted.alias("planted"), moji.alias("moji")
    )
    return staged.select(
        "doc_id",
        repair_mojibake(F.col("moji")).alias("text"),
        "planted",
        "moji",
    ).select(
        "doc_id",
        "text",
        (F.col("text") == F.col("planted")).alias("restored"),
        (F.length("moji") - F.length("text")).cast("long").alias(
            "n_gremlin_chars"
        ),
    )


def _ann_recall_oracle_sql(k: int = 10, n_probe: int = 2, n_q: int = 20) -> str:
    """Mirror q163's three-variant IVF recall end-to-end: cell
    assignment by raw-dot first-max (``ivf_topk``'s argmax, NOT q39's
    cosine assign), per-query top-``n_probe`` probe cells (dot desc,
    index asc — ``ivf_topk_indexed``'s array_sort comparator), then
    each variant's exact scoring formula (fp64 / SQ8 asymmetric with
    true norms / grid-PQ reconstruction) and set-intersection recall
    against the exact top-k. Every similarity is the q27 discipline
    (array-order inner product, rounded-6, id tie-break); recall is
    pure integer — the output carries NO float column at all."""
    kc = len(CENTROIDS)
    dots = ", ".join(
        f"list_inner_product(ve, {_sql_double_array(c)})" for c in CENTROIDS
    )
    sq8 = (
        "round((qscale * list_inner_product(qv, qvec)) / (qn * n), 6)"
    )
    recalls = []
    for variant in ("fp64", "sq8", "pq"):
        recalls.append(
            f"""
    rec_{variant} AS (
        SELECT e.query_id, CAST(count(x.query_id) AS BIGINT) AS n_hit
        FROM ext e LEFT JOIN apx_{variant} x
          ON e.query_id = x.query_id AND e.neighbor_id = x.neighbor_id
        GROUP BY e.query_id
    )"""
        )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    a AS MATERIALIZED (
        SELECT vec_id, ve, sqrt(list_inner_product(ve, ve)) AS n,
               list_indexof(dots, list_max(dots)) AS cid, dots
        FROM (SELECT vec_id, ve, [{dots}] AS dots FROM v)
    ),
    qp AS MATERIALIZED (
        SELECT query_id, qv, qn, cell AS cid FROM (
            SELECT a.vec_id AS query_id, a.ve AS qv, a.n AS qn,
                   u.i AS cell, u.d,
                   row_number() OVER (
                       PARTITION BY a.vec_id ORDER BY u.d DESC, u.i
                   ) AS rk
            FROM a, LATERAL (
                SELECT unnest(a.dots) AS d,
                       unnest(range(1, {kc + 1})) AS i
            ) u
            WHERE a.vec_id < {n_q}
        ) WHERE rk <= {n_probe}
    ),
    ext AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       round(list_inner_product(q.ve, c.ve) / (q.n * c.n), 6)
                           DESC, c.vec_id) AS rk
            FROM a q JOIN a c ON c.vec_id != q.vec_id
            WHERE q.vec_id < {n_q}
        ) WHERE rk <= {k}
    ),
    apx_fp64 AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT qp.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qp.query_id ORDER BY
                       round(list_inner_product(qp.qv, c.ve) / (qp.qn * c.n), 6)
                           DESC, c.vec_id) AS rk
            FROM qp JOIN a c ON c.cid = qp.cid AND c.vec_id != qp.query_id
        ) WHERE rk <= {k}
    ),
    sq AS MATERIALIZED (
        SELECT vec_id, cid, n, qscale,
               list_transform(ve, x -> round(x / qscale)) AS qvec
        FROM (
            SELECT *, greatest(
                list_max(list_transform(ve, x -> abs(x))) / 127.0, 1e-12
            ) AS qscale FROM a
        )
    ),
    apx_sq8 AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT qp.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qp.query_id ORDER BY
                       {sq8} DESC, c.vec_id) AS rk
            FROM qp JOIN sq c ON c.cid = qp.cid AND c.vec_id != qp.query_id
        ) WHERE rk <= {k}
    ),
    pqc AS MATERIALIZED (
        SELECT vec_id, cid, n,
               {_PQ_RECON_SQL.format(v='ve')} AS rv
        FROM a
    ),
    apx_pq AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT qp.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY qp.query_id ORDER BY
                       round(list_inner_product(qp.qv, c.rv) / (qp.qn * c.n), 6)
                           DESC, c.vec_id) AS rk
            FROM qp JOIN pqc c ON c.cid = qp.cid AND c.vec_id != qp.query_id
        ) WHERE rk <= {k}
    ),{",".join(recalls)}
    SELECT 'fp64' AS variant, query_id, n_hit,
           CAST((1000000 * n_hit) // {k} AS BIGINT) AS recall_ppm
    FROM rec_fp64
    UNION ALL
    SELECT 'sq8', query_id, n_hit, CAST((1000000 * n_hit) // {k} AS BIGINT)
    FROM rec_sq8
    UNION ALL
    SELECT 'pq', query_id, n_hit, CAST((1000000 * n_hit) // {k} AS BIGINT)
    FROM rec_pq
    """


_IVF_RECALL_INDEXES: dict = {}


def _ivf_recall_index_paths(spark: SparkSession, sf_dir: str) -> dict:
    """Build the three persisted IVF indexes (fp64 / SQ8 / grid-PQ)
    ONCE per sf_dir per process (the q128 memoization rationale: an
    index exists to be built once and probed many times — per-call
    builds would make bench trials measure the build and leak index
    trees)."""
    paths = _IVF_RECALL_INDEXES.get(sf_dir)
    if paths is None:
        import tempfile

        from dataflow_python_etl_spark.operators.similarity import (
            build_ivf_index,
            fit_pq_grid_codebooks,
        )

        emb = _t(spark, sf_dir, "embeddings")
        base = tempfile.mkdtemp(prefix="ivf_recall_")
        paths = {}
        for variant, kw in (
            ("fp64", {}),
            ("sq8", {"quantize": "int8"}),
            ("pq", {"quantize": "pq", "pq_codebooks": fit_pq_grid_codebooks()}),
        ):
            p = f"{base}/{variant}"
            build_ivf_index(emb, CENTROIDS, p, **kw)
            paths[variant] = p
        _IVF_RECALL_INDEXES[sf_dir] = paths
    return paths


@_q(
    "q163_ann_recall",
    _ann_recall_oracle_sql(),
    "ANN retrieval QUALITY under the cross-engine hash gate (VERDICT "
    "r9 #5 — recall was previously pytest-pinned at fixed geometries "
    "only): recall@10 of ivf_topk_indexed against the exact "
    "cosine_topk top-10, per query and per index variant — fp64 "
    "inverted file, SQ8 (asymmetric scalar quantization, true "
    "pre-quantization norms), and data-independent grid-PQ "
    "reconstruction (q154/q159's closed form) — probing n_probe=2 of "
    "8 cells from the PERSISTED partition-pruned indexes (built once "
    "per sf_dir, the q128 memoization). Recall is exact-integer "
    "(n_hit of 10 as ppm), so the output hash carries retrieval "
    "quality itself, not a float proxy; the oracle replays cell "
    "assignment (raw-dot first-max), probe selection (dot desc, "
    "index tie-break), all three scoring formulas, and the set "
    "intersection bit-for-bit.",
)
def q163_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.dedup import register_cache
    from dataflow_python_etl_spark.operators.similarity import (
        _query_probe_frame,
        cosine_topk,
        ivf_topk_indexed,
    )

    K, NPROBE, NQ = 10, 2, 20
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < NQ)
    # Optimization r11 (guide §2.4 remove shuffles, §3.1 deliberate
    # joins, §5): stage-level profiling showed near-ZERO executor time
    # — the whole wall was driver/scheduling overhead across ~50 tiny
    # stages. Three fixes, all value-preserving: (a) ONE probe-frame
    # collect shared by all three variants (was one per variant —
    # three identical jobs); (b) the exact top-k baseline behind a
    # REGISTERED cache so the union evaluates its window once, not
    # once per branch (36 parquet scans in the before plan); (c)
    # explicit broadcasts of the structurally bounded recall frames —
    # ``approx`` ≤ NQ·K rows and ``hits`` ≤ NQ rows BY CONTRACT at any
    # corpus size, so the hint is scale-safe and removes the
    # Exchange+Sort pairs of six tiny sort-merge joins from the plan
    # (plans/r11/q163_ann_recall_{before,after}.txt).
    probe = _query_probe_frame(queries, CENTROIDS, NPROBE, "vec_id", "embedding")
    exact = register_cache(
        cosine_topk(emb, queries, k=K).select("query_id", "neighbor_id")
    )
    paths = _ivf_recall_index_paths(spark, sf_dir)
    outs = []
    for variant in ("fp64", "sq8", "pq"):
        approx = ivf_topk_indexed(
            spark, paths[variant], queries,
            centroids=CENTROIDS, k=K, n_probe=NPROBE, _probe=probe,
        ).select("query_id", "neighbor_id")
        hits = (
            exact.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("__h"))
        )
        outs.append(
            queries.select(F.col("vec_id").alias("query_id"))
            .join(F.broadcast(hits), "query_id", "left")
            .select(
                F.lit(variant).alias("variant"),
                "query_id",
                F.coalesce(F.col("__h"), F.lit(0)).cast("long").alias("n_hit"),
                F.expr(f"(1000000 * coalesce(__h, 0)) div {K}")
                .cast("long")
                .alias("recall_ppm"),
            )
        )
    return outs[0].unionByName(outs[1]).unionByName(outs[2])


_PACK_SEQ_LEN = 256


@_q(
    "q164_sequence_packing",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> length(x) > 0)) + 1 AS BIGINT) AS n_tok
        FROM documents
    ),
    d AS (SELECT doc_id, n_tok FROM t WHERE n_tok >= 2),
    p AS (
        SELECT doc_id, n_tok,
               CAST(coalesce(sum(n_tok) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start
        FROM d
    ),
    s AS (
        SELECT doc_id, n_tok, start, u.seq_id
        FROM p, LATERAL (
            SELECT unnest(range(start // {_PACK_SEQ_LEN},
                                (start + n_tok - 1) // {_PACK_SEQ_LEN} + 1))
                   AS seq_id
        ) u
    )
    SELECT seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(start + n_tok, (seq_id + 1) * {_PACK_SEQ_LEN})
                    - greatest(start, seq_id * {_PACK_SEQ_LEN}))
                AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM s GROUP BY seq_id
    """,
    "Fixed-length training-sequence packing (corpus.pack_sequences) — "
    "the export step every LLM pipeline runs after curation: docs "
    "concatenate in doc_id order with one EOS each, the token stream "
    "cuts into back-to-back 256-token sequences (docs cross "
    "boundaries — contiguous GPT-style packing), output = the packing "
    "manifest (seq_id, n_docs, n_tokens, first_doc, last_doc). The "
    "Spark side computes the global token prefix sum WITHOUT the "
    "single-partition Window.orderBy wall: range-repartition on "
    "doc_id + one narrow hash exchange for the per-partition running "
    "sum + broadcast partition offsets (the global_rank machinery); "
    "each doc explodes to only the <= n_tok/256 + 1 sequences it "
    "overlaps, so everything after the token COUNT is O(docs), never "
    "O(tokens). The oracle spells the same prefix-sum + interval "
    "arithmetic with a plain ordered window — exact integers "
    "throughout, so the manifests hash identically.",
)
def q164_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), seq_len=_PACK_SEQ_LEN
    )


_MIX_BUDGET = 600


@_q(
    "q165_token_budget_mix",
    f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> length(x) > 0)) AS BIGINT) AS n_tokens
        FROM documents
    ),
    d AS (SELECT * FROM t WHERE n_tokens >= 1),
    p AS (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM d
    )
    SELECT doc_id, source, n_tokens, cum_before
    FROM p WHERE cum_before < {_MIX_BUDGET}
    """,
    "Static data-mixing selection (corpus.select_token_budget — the "
    "DoReMi/The-Pile mixture step: each domain contributes a token "
    "BUDGET, not a doc count): within each source, docs are taken in "
    "id order while the domain's running token total is under 600; "
    "the crossing doc is kept (greedy fill, progress guaranteed). "
    "Output = the selected manifest with cum_before as the audit "
    "trail of why each doc made the mix. The Spark side computes the "
    "per-domain running sums WITHOUT the per-domain single-task wall "
    "(a plain Window.partitionBy(domain) funnels each domain's "
    "terabytes through one task at few-domain scale): "
    "range-repartition on (domain, id) + per-(domain, partition) "
    "totals broadcast as offsets + in-partition running sum — the "
    "grouped form of q164's prefix-sum machinery. The oracle spells "
    "the plain per-domain window; exact integers throughout.",
)
def q165_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import select_token_budget

    return select_token_budget(
        _t(spark, sf_dir, "documents"), budget_tokens=_MIX_BUDGET
    )


_ERASURE_AUDIT_CACHE: dict = {}


@_q(
    "q166_erasure_audit",
    """
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    postings AS (
        SELECT DISTINCT doc_id, w
        FROM (SELECT doc_id, unnest(toks) AS w FROM tok)
    ),
    lens AS (SELECT doc_id, len(toks) AS dl FROM tok),
    band_docs AS (SELECT doc_id FROM lens WHERE dl >= 3),
    a AS (
        SELECT 'band_index' AS surface,
               CAST(8 * (SELECT count(*) FROM band_docs) AS BIGINT)
                   AS rows_before,
               CAST(8 * (SELECT count(*) FROM band_docs WHERE doc_id % 7 = 3)
                   AS BIGINT) AS rows_removed,
               CAST(NULL AS BIGINT) AS n_docs_after,
               CAST(NULL AS BIGINT) AS sum_dl_after
        UNION ALL
        SELECT 'ivf_index',
               (SELECT count(*) FROM embeddings),
               (SELECT count(*) FROM embeddings WHERE vec_id % 7 = 3),
               NULL, NULL
        UNION ALL
        SELECT 'search_index',
               (SELECT count(*) FROM postings),
               (SELECT count(*) FROM postings WHERE doc_id % 7 = 3),
               (SELECT count(*) FROM documents WHERE doc_id % 7 <> 3),
               CAST((SELECT sum(dl) FROM lens WHERE doc_id % 7 <> 3) AS BIGINT)
        UNION ALL
        SELECT 'table',
               (SELECT count(*) FROM documents),
               (SELECT count(*) FROM documents WHERE doc_id % 7 = 3),
               NULL, NULL
    )
    SELECT surface, rows_before, rows_removed,
           CAST(rows_before - rows_removed AS BIGINT) AS rows_after,
           n_docs_after, sum_dl_after
    FROM a ORDER BY surface
    """,
    "Right-to-be-forgotten propagation through PERSISTED DERIVED "
    "state (operators.erasure.forget_everywhere): doc/vec ids with "
    "id % 7 == 3 are erased from a corpus-table copy, the BM25 "
    "postings index (with the n_docs/sum_dl sidecar corrected in the "
    "same atomic swap), the bucketed MinHash band index (bucket spec "
    "preserved — probes stay co-located, pinned in test_erasure), "
    "and the IVF vector index (sidecars carried), returning ONE "
    "audit report. The oracle recomputes every surface's cardinality "
    "from first principles: postings = distinct (doc, token) pairs, "
    "band rows = 8 per doc with >= 3 tokens (num_perm 32 / "
    "rows_per_band 4), IVF rows = embeddings. The search row also "
    "carries the corrected sidecar scalars — erasure must equal a "
    "rebuild from the cleansed corpus (rebuild-equivalence pinned in "
    "tests). KMV/HLL/CMS sketch MVs cannot subtract and are "
    "tombstoned instead (policy + pins in operators.erasure / "
    "test_erasure).",
)
def q166_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cached = _ERASURE_AUDIT_CACHE.get(sf_dir)
    if cached is None:
        import re
        import tempfile

        from dataflow_python_etl_spark.operators.dedup import (
            BandIndexStore,
            minhash_band_index,
        )
        from dataflow_python_etl_spark.operators.erasure import forget_everywhere
        from dataflow_python_etl_spark.operators.search import (
            build_search_index,
            load_search_stats,
        )
        from dataflow_python_etl_spark.operators.similarity import (
            build_ivf_index,
            fit_ivf_centroids,
        )

        # ONE erasure pass per sf_dir per process (the q128/q163
        # memoization rule) — the pass mutates its private tmp copies,
        # so the audit numbers are computed once and the returned
        # frame is rebuilt from them deterministically per call.
        base = tempfile.mkdtemp(prefix="erasure_q166_")
        docs = _t(spark, sf_dir, "documents")
        emb = _t(spark, sf_dir, "embeddings")
        tbl = base + "/documents"
        docs.write.parquet(tbl)
        six = base + "/search_index"
        build_search_index(docs, six)
        store = BandIndexStore(
            spark,
            f"q166_bix_{re.sub(r'[^A-Za-z0-9]+', '_', sf_dir)}",
            path=base + "/band_index",
            n_buckets=8,
        )
        store.append(minhash_band_index(docs))
        ivf = base + "/ivf_index"
        build_ivf_index(emb, fit_ivf_centroids(emb, k=4), ivf, id_col="vec_id")
        keys = (
            docs.select(F.col("doc_id").alias("k"))
            .unionByName(emb.select(F.col("vec_id").alias("k")))
            .where(F.col("k") % 7 == 3)
            .distinct()
        )
        audit = forget_everywhere(
            spark,
            keys,
            key_col="k",
            tables=[(tbl, "doc_id")],
            search_indexes=[six],
            band_indexes=[store],
            ivf_indexes=[(ivf, "k")],
        ).collect()
        stats = load_search_stats(six)
        cached = sorted(
            (
                r["surface"],
                r["rows_before"],
                r["rows_removed"],
                r["rows_after"],
                stats["n_docs"] if r["surface"] == "search_index" else None,
                stats["sum_dl"] if r["surface"] == "search_index" else None,
            )
            for r in audit
        )
        store.drop()
        _ERASURE_AUDIT_CACHE[sf_dir] = cached
    return spark.createDataFrame(
        cached,
        "surface string, rows_before long, rows_removed long, "
        "rows_after long, n_docs_after long, sum_dl_after long",
    ).orderBy("surface")


def _ann_recall_rerank_oracle_sql(
    k: int = 10, n_probe: int = 2, n_q: int = 20, rerank: int = 50
) -> str:
    """Mirror q167 end-to-end: q163's cell assignment / probe
    selection / grid-PQ scoring verbatim, then the two-stage rerank —
    top-``rerank`` by PQ score (same rounded-6 + id tie-break), those
    pairs re-scored with the fp64 formula, top-``k`` by the refined
    score. Recall is the same exact-integer ppm as q163."""
    kc = len(CENTROIDS)
    dots = ", ".join(
        f"list_inner_product(ve, {_sql_double_array(c)})" for c in CENTROIDS
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    a AS MATERIALIZED (
        SELECT vec_id, ve, sqrt(list_inner_product(ve, ve)) AS n,
               list_indexof(dots, list_max(dots)) AS cid, dots
        FROM (SELECT vec_id, ve, [{dots}] AS dots FROM v)
    ),
    qp AS MATERIALIZED (
        SELECT query_id, qv, qn, cell AS cid FROM (
            SELECT a.vec_id AS query_id, a.ve AS qv, a.n AS qn,
                   u.i AS cell, u.d,
                   row_number() OVER (
                       PARTITION BY a.vec_id ORDER BY u.d DESC, u.i
                   ) AS rk
            FROM a, LATERAL (
                SELECT unnest(a.dots) AS d,
                       unnest(range(1, {kc + 1})) AS i
            ) u
            WHERE a.vec_id < {n_q}
        ) WHERE rk <= {n_probe}
    ),
    ext AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       round(list_inner_product(q.ve, c.ve) / (q.n * c.n), 6)
                           DESC, c.vec_id) AS rk
            FROM a q JOIN a c ON c.vec_id != q.vec_id
            WHERE q.vec_id < {n_q}
        ) WHERE rk <= {k}
    ),
    pqc AS MATERIALIZED (
        SELECT vec_id, cid, n,
               {_PQ_RECON_SQL.format(v='ve')} AS rv
        FROM a
    ),
    ranked_pq AS MATERIALIZED (
        SELECT qp.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qp.query_id ORDER BY
                   round(list_inner_product(qp.qv, c.rv) / (qp.qn * c.n), 6)
                       DESC, c.vec_id) AS rk
        FROM qp JOIN pqc c ON c.cid = qp.cid AND c.vec_id != qp.query_id
    ),
    apx_pq AS (SELECT query_id, neighbor_id FROM ranked_pq WHERE rk <= {k}),
    shortlist AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM ranked_pq WHERE rk <= {rerank}
    ),
    apx_rr AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT s.query_id, s.neighbor_id,
                   row_number() OVER (PARTITION BY s.query_id ORDER BY
                       round(list_inner_product(q.ve, c.ve) / (q.n * c.n), 6)
                           DESC, s.neighbor_id) AS rk
            FROM shortlist s
            JOIN a q ON q.vec_id = s.query_id
            JOIN a c ON c.vec_id = s.neighbor_id
        ) WHERE rk <= {k}
    ),
    rec_pq AS (
        SELECT e.query_id, CAST(count(x.query_id) AS BIGINT) AS n_hit
        FROM ext e LEFT JOIN apx_pq x
          ON e.query_id = x.query_id AND e.neighbor_id = x.neighbor_id
        GROUP BY e.query_id
    ),
    rec_rr AS (
        SELECT e.query_id, CAST(count(x.query_id) AS BIGINT) AS n_hit
        FROM ext e LEFT JOIN apx_rr x
          ON e.query_id = x.query_id AND e.neighbor_id = x.neighbor_id
        GROUP BY e.query_id
    )
    SELECT 'pq' AS variant, query_id, n_hit,
           CAST((1000000 * n_hit) // {k} AS BIGINT) AS recall_ppm
    FROM rec_pq
    UNION ALL
    SELECT 'pq_rerank', query_id, n_hit, CAST((1000000 * n_hit) // {k} AS BIGINT)
    FROM rec_rr
    """


@_q(
    "q167_ann_recall_reranked",
    _ann_recall_rerank_oracle_sql(),
    "Two-stage ANN re-ranking under the cross-engine hash gate "
    "(VERDICT r10 #2 — closing q163's PQ recall gap, the FAISS "
    "IVFPQ+Refine shape): similarity.ivf_topk_indexed_reranked takes "
    "a 50-candidate shortlist from the grid-PQ index and re-scores "
    "ONLY those pairs against the fp64 index (same centroid fit — "
    "enforced loudly, both stages prune to the SAME probed cells; "
    "the refine scan also pushes neighbor_id IN (shortlist) into the "
    "parquet scan — the columnar analog of id-keyed refinement "
    "fetch). Output = q163's recall rows for the raw 'pq' variant "
    "and the 'pq_rerank' variant side by side, so the recall "
    "recovery is itself hash-verified; the oracle replays shortlist "
    "ranking and refined re-scoring bit-for-bit.",
)
def q167_ann_recall_reranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.dedup import register_cache
    from dataflow_python_etl_spark.operators.similarity import (
        _query_probe_frame,
        cosine_topk,
        ivf_topk_indexed,
        ivf_topk_indexed_reranked,
    )

    K, NPROBE, NQ, R = 10, 2, 20, 50
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < NQ)
    paths = _ivf_recall_index_paths(spark, sf_dir)
    # Optimization r11 (guide §2.4, §5): the before shape probed the
    # PQ index THREE times per run (the 'pq' variant, the shortlist
    # job inside the reranked probe, and that probe's own re-derived
    # probe frame — plus two more probe-cid collect jobs). Now: ONE
    # probe-frame collect, ONE cached k=R coarse probe whose rk<=K
    # prefix IS the 'pq' variant (same window, same tie-break — the
    # top-10 of the top-50 is the top-10), the reranked stage reuses
    # both, and the exact baseline sits behind a registered cache so
    # the final union computes it once. Rows identical by
    # construction; hash-verified against the unchanged oracle.
    probe = _query_probe_frame(queries, CENTROIDS, NPROBE, "vec_id", "embedding")
    ranked = register_cache(
        ivf_topk_indexed(
            spark, paths["pq"], queries, centroids=CENTROIDS,
            k=R, n_probe=NPROBE, _probe=probe, _keep_rank=True,
        )
    )
    exact = register_cache(
        cosine_topk(emb, queries, k=K).select("query_id", "neighbor_id")
    )
    variants = {
        "pq": ranked.where(F.col("rk") <= K).select(
            "query_id", "neighbor_id", "cos_sim"
        ),
        "pq_rerank": ivf_topk_indexed_reranked(
            spark, paths["pq"], paths["fp64"], queries,
            k=K, n_probe=NPROBE, rerank=R,
            _probe=probe, _short=ranked,
        ),
    }
    outs = []
    for variant, approx in variants.items():
        # explicit broadcasts: ``approx`` ≤ NQ·K and ``hits`` ≤ NQ rows
        # BY CONTRACT at any corpus size (q163's rationale) — removes
        # four tiny sort-merge joins' Exchange+Sort pairs per run
        hits = (
            exact.join(
                F.broadcast(approx.select("query_id", "neighbor_id")),
                ["query_id", "neighbor_id"],
                "left_semi",
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("__h"))
        )
        outs.append(
            queries.select(F.col("vec_id").alias("query_id"))
            .join(F.broadcast(hits), "query_id", "left")
            .select(
                F.lit(variant).alias("variant"),
                "query_id",
                F.coalesce(F.col("__h"), F.lit(0)).cast("long").alias("n_hit"),
                F.expr(f"(1000000 * coalesce(__h, 0)) div {K}")
                .cast("long")
                .alias("recall_ppm"),
            )
        )
    return outs[0].unionByName(outs[1])


@_q(
    "q168_sequence_packing_bpe",
    f"""
    WITH staged AS (
        SELECT doc_id,
               replace(replace(text, 'the', 'The.42'), 'merge', 'Merge-7')
                   AS text
        FROM documents
    ),
    t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) + 1 AS BIGINT)
                   AS n_tok
        FROM staged
    ),
    d AS (SELECT doc_id, n_tok FROM t WHERE n_tok >= 2),
    p AS (
        SELECT doc_id, n_tok,
               CAST(coalesce(sum(n_tok) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start
        FROM d
    ),
    s AS (
        SELECT doc_id, n_tok, start, u.seq_id
        FROM p, LATERAL (
            SELECT unnest(range(start // {_PACK_SEQ_LEN},
                                (start + n_tok - 1) // {_PACK_SEQ_LEN} + 1))
                   AS seq_id
        ) u
    )
    SELECT seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(start + n_tok, (seq_id + 1) * {_PACK_SEQ_LEN})
                    - greatest(start, seq_id * {_PACK_SEQ_LEN}))
                AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM s GROUP BY seq_id
    """,
    "q164's sequence packing in TOKENIZER units (VERDICT r10 #3: real "
    "training budgets are tokenizer-unit budgets, not whitespace "
    "words): pack_sequences(token_mode='bpe') counts the portable "
    "BPE-ish subword segmentation q38/chunk_documents already share "
    "(functions.text.bpe_tokens — lowercase runs, digit runs, single "
    "marks; matches non-empty by construction, so no ''-artifact "
    "filter), same distributed prefix-sum machinery, same manifest "
    "shape. The driver corpus is pure lowercase space-separated words "
    "— bpe == whitespace counts on it, which would make a plain twin "
    "VACUOUS — so the query first plants case/punct/digits with "
    "literal replaces both engines share ('the'->'The.42', "
    "'merge'->'Merge-7': measured 66.9 vs 55.9 mean tokens/doc), and "
    "the manifests only hash-match if the subword segmentation "
    "semantics agree.",
)
def q168_sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import pack_sequences

    return pack_sequences(
        _bpe_stage(_t(spark, sf_dir, "documents")),
        seq_len=_PACK_SEQ_LEN,
        token_mode="bpe",
    )


def _bpe_stage(docs: DataFrame) -> DataFrame:
    """Plant case/punctuation/digits deterministically (literal global
    replaces — identical semantics in Spark and DuckDB) so the bpe
    token unit actually DIVERGES from whitespace words on the
    all-lowercase driver corpus; see q168's docstring."""
    return docs.withColumn(
        "text",
        F.replace(
            F.replace(F.col("text"), F.lit("the"), F.lit("The.42")),
            F.lit("merge"),
            F.lit("Merge-7"),
        ),
    )


_MIX_BUDGET_BPE = 1200  # subword units run ~2x whitespace words


@_q(
    "q169_token_budget_mix_bpe",
    f"""
    WITH staged AS (
        SELECT doc_id, source,
               replace(replace(text, 'the', 'The.42'), 'merge', 'Merge-7')
                   AS text
        FROM documents
    ),
    t AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT)
                   AS n_tokens
        FROM staged
    ),
    d AS (SELECT * FROM t WHERE n_tokens >= 1),
    p AS (
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM d
    )
    SELECT doc_id, source, n_tokens, cum_before
    FROM p WHERE cum_before < {_MIX_BUDGET_BPE}
    """,
    "q165's per-domain token-budget mixing in TOKENIZER units "
    "(VERDICT r10 #3): select_token_budget(token_mode='bpe') fills "
    "each domain's budget in q38's portable subword units via the "
    "same grouped distributed prefix sum, over the q168-staged text "
    "(planted case/punct/digits — the all-lowercase driver corpus "
    "would otherwise make bpe == whitespace and the twin vacuous). "
    "Budget 1200 subword units per domain.",
)
def q169_token_budget_mix_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.corpus import select_token_budget

    return select_token_budget(
        _bpe_stage(_t(spark, sf_dir, "documents")),
        budget_tokens=_MIX_BUDGET_BPE,
        token_mode="bpe",
    )


@_q(
    "q170_classifier_eval",
    f"""
    WITH scored AS MATERIALIZED ({_qclf_oracle_sql(buckets=16, epochs=2)}),
    per_m AS (
        SELECT margin,
               CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p,
               CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS g
        FROM scored GROUP BY margin
    ),
    pref AS (
        SELECT p, g,
               CAST(coalesce(sum(g) OVER (ORDER BY margin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cumneg
        FROM per_m
    ),
    uagg AS (
        SELECT CAST(coalesce(sum(p * (2 * cumneg + g)), 0) AS BIGINT) AS u2,
               CAST(coalesce(sum(p), 0) AS BIGINT) AS n_pos,
               CAST(coalesce(sum(g), 0) AS BIGINT) AS n_neg
        FROM pref
    ),
    conf AS (
        SELECT CAST(count(*) FILTER (WHERE label AND margin > 0) AS BIGINT) AS tp,
               CAST(count(*) FILTER (WHERE NOT label AND margin > 0) AS BIGINT) AS fp,
               CAST(count(*) FILTER (WHERE NOT label AND margin <= 0) AS BIGINT) AS tn,
               CAST(count(*) FILTER (WHERE label AND margin <= 0) AS BIGINT) AS fn
        FROM scored
    )
    SELECT n_pos + n_neg AS n, n_pos, n_neg, tp, fp, tn, fn,
           CASE WHEN n_pos + n_neg > 0
                THEN (1000000 * (tp + tn)) // (n_pos + n_neg) END
               AS accuracy_ppm,
           CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp) END
               AS precision_ppm,
           CASE WHEN n_pos > 0 THEN (1000000 * tp) // n_pos END AS recall_ppm,
           u2,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN (1000000 * u2) // (2 * n_pos * n_neg) END AS auc_ppm
    FROM uagg, conf
    """,
    "Classifier EVALUATION — the train→score→evaluate step that "
    "decides whether q161's gate ships (fastText's own `test` verb): "
    "exact-integer confusion counts at the margin>0 decision rule "
    "(accuracy/precision/recall as floor-div ppm — single integer "
    "division, cross-engine exact) plus tie-corrected ROC AUC via "
    "the Mann-Whitney U statistic over the held-out fifth. Margins "
    "are exact integers (the q161 contract), so AUC groups by "
    "DISTINCT margin and prefix-sums negative counts in margin "
    "order: U2 = sum p_m*(2*cumneg+g_m) — twice U, so ties never "
    "make a half; auc_ppm = (1e6*U2) div (2*n_pos*n_neg). The "
    "prefix sum runs on the distributed range-repartition machinery "
    "(pack_sequences pattern — no data-sized single-task window); "
    "a filter-anchored raise_error fires when 1e6*U2 would leave "
    "int64 (eval on a bounded labeled split — the training "
    "posture). Evaluates a deliberately WEAKER model than q161 "
    "(buckets=16, epochs=2 — hash collisions force class overlap: "
    "auc 0.9955, not 1.0) so the confusion/AUC algebra is exercised "
    "on non-degenerate statistics; the full q161 model is perfect "
    "on this split, which would leave the tie/overlap paths "
    "untested by the gate. Oracle = the parameterized q161 "
    "fixed-unroll fit+score composed with the identical window "
    "algebra.",
)
def q170_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.classifier import classifier_eval

    return classifier_eval(_qclf_scored(spark, sf_dir, buckets=16, epochs=2))


_DRIFT_BUCKETS = 1024


def _md5_split(side: int) -> F.Column:
    """Deterministic 50/50 snapshot split ORTHOGONAL to the table
    layout: parity of md5_hash60(doc_id). A doc_id parity split would
    silently split BY DOMAIN here (driver testdata assigns doc_id %
    n_sources = source index — measured), making per-domain drift
    vacuous and global drift a domain-composition artifact."""
    from dataflow_python_etl_spark.functions.text import md5_hash60

    return md5_hash60(F.col("doc_id").cast("string")) % 2 == F.lit(side)


def _drift_gram_sql(src: str) -> str:
    """Per-snapshot hashed-gram bucket counts mirroring
    ``lm._gram_buckets`` (the q161 oracle's tok/g pattern): whitespace
    unigrams + adjacent bigrams, empties dropped, md5-hashed with the
    drift prefix."""
    return f"""
        SELECT {_md5h60_sql("'drift-v1:' || gram")} % {_DRIFT_BUCKETS}
                   AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(toks) AS gram FROM {src}
            UNION ALL
            SELECT array_to_string(toks[i:i+1], ' ') AS gram
            FROM {src}, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
        ) g
        GROUP BY bucket
    """


@_q(
    "q171_corpus_drift",
    f"""
    WITH refd AS (
        SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents WHERE list_reduce(list_prepend(0::BIGINT, list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''), c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), (acc, x) -> acc * 16 + x) % 2 = 0
    ),
    curd AS (
        SELECT list_filter(regexp_split_to_array(
                   replace(text, 'the', 'quantum'), '\\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents WHERE list_reduce(list_prepend(0::BIGINT, list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''), c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), (acc, x) -> acc * 16 + x) % 2 = 1
    ),
    rh AS MATERIALIZED ({_drift_gram_sql('refd')}),
    ch AS MATERIALIZED ({_drift_gram_sql('curd')}),
    j AS (
        SELECT coalesce(rh.bucket, ch.bucket) AS bucket,
               CAST(coalesce(rh.cnt, 0) AS BIGINT) AS ref_count,
               CAST(coalesce(ch.cnt, 0) AS BIGINT) AS cur_count
        FROM rh FULL OUTER JOIN ch ON rh.bucket = ch.bucket
    ),
    tot AS (
        SELECT CAST(sum(ref_count) AS BIGINT) AS n_ref,
               CAST(sum(cur_count) AS BIGINT) AS n_cur
        FROM j
    ),
    d AS (
        SELECT bucket, ref_count, cur_count,
               CAST(abs(ref_count * n_cur - cur_count * n_ref) AS BIGINT)
                   AS contrib,
               n_ref, n_cur
        FROM j, tot
    ),
    s AS (SELECT CAST(sum(contrib) AS BIGINT) AS sum_contrib FROM d),
    r AS (
        SELECT *, row_number() OVER (ORDER BY contrib DESC, bucket) AS rk
        FROM d
    )
    SELECT bucket, ref_count, cur_count, contrib,
           CAST(rk AS BIGINT) AS rank, n_ref, n_cur,
           (1000000 * sum_contrib) // (2 * n_ref * n_cur) AS tvd_ppm
    FROM r, s WHERE rk <= 20
    """,
    "Corpus drift monitor — the data-quality gate every production "
    "ingest runs (did this crawl shift vocabulary vs the reference "
    "corpus?): total variation distance over the shared hashed "
    "unigram+bigram bucket histogram (lm._gram_buckets — one gram "
    "kernel for the whole DSIR/classifier/drift family) plus the 20 "
    "most-drifted buckets as the actionable report. TVD stays "
    "exact-integer by cross-multiplying: contrib_b = "
    "|r_b*C - c_b*R|, tvd_ppm = (1e6*sum contrib) div (2*R*C) — one "
    "floor division (chi-square/KL/PSI need per-bucket division or "
    "ln, engine-private). Snapshots are data-derived: ref = even "
    "doc_ids, cur = odd doc_ids with 'the'->'quantum' planted (a "
    "material vocabulary shift both engines stage identically). "
    "Both histograms collapse map-side to <=1024 rows BEFORE the "
    "full-outer join; the top-k window runs on that summary-sized "
    "frame. Filter-anchored int64 guard at the exact "
    "2e6*R*C bound (at 100 TB, drift-monitor a sampled window — "
    "the guard makes the posture loud). Ranked by exact integer "
    "contrib with bucket tie-break (the ranking discipline).",
)
def q171_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.lm import corpus_drift

    docs = _t(spark, sf_dir, "documents")
    ref = docs.where(_md5_split(0))
    cur = docs.where(_md5_split(1)).withColumn(
        "text", F.replace(F.col("text"), F.lit("the"), F.lit("quantum"))
    )
    return corpus_drift(ref, cur, buckets=_DRIFT_BUCKETS, top_k=20)


def _drift_group_gram_sql(src: str) -> str:
    """Grouped twin of :func:`_drift_gram_sql`: per-(source, bucket)
    hashed-gram counts."""
    return f"""
        SELECT source,
               {_md5h60_sql("'drift-v1:' || gram")} % {_DRIFT_BUCKETS}
                   AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM (
            SELECT source, unnest(toks) AS gram FROM {src}
            UNION ALL
            SELECT source, array_to_string(toks[i:i+1], ' ') AS gram
            FROM {src}, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
        ) g
        GROUP BY source, bucket
    """


@_q(
    "q172_corpus_drift_by_domain",
    f"""
    WITH refd AS (
        SELECT source,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents WHERE list_reduce(list_prepend(0::BIGINT, list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''), c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), (acc, x) -> acc * 16 + x) % 2 = 0
    ),
    curd AS (
        SELECT source,
               list_filter(regexp_split_to_array(
                   CASE WHEN CAST(substr(source, 4) AS INTEGER) % 3 = 0
                        THEN replace(text, 'the', 'quantum') ELSE text END,
                   '\\s+'), x -> length(x) > 0) AS toks
        FROM documents WHERE list_reduce(list_prepend(0::BIGINT, list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''), c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), (acc, x) -> acc * 16 + x) % 2 = 1
    ),
    rh AS MATERIALIZED ({_drift_group_gram_sql('refd')}),
    ch AS MATERIALIZED ({_drift_group_gram_sql('curd')}),
    j AS (
        SELECT coalesce(rh.source, ch.source) AS source,
               coalesce(rh.bucket, ch.bucket) AS bucket,
               CAST(coalesce(rh.cnt, 0) AS BIGINT) AS ref_count,
               CAST(coalesce(ch.cnt, 0) AS BIGINT) AS cur_count
        FROM rh FULL OUTER JOIN ch
          ON rh.source = ch.source AND rh.bucket = ch.bucket
    ),
    tot AS (
        SELECT source, CAST(sum(ref_count) AS BIGINT) AS n_ref,
               CAST(sum(cur_count) AS BIGINT) AS n_cur
        FROM j GROUP BY source
    ),
    d AS (
        SELECT j.source, bucket, ref_count, cur_count, n_ref, n_cur,
               CAST(abs(ref_count * n_cur - cur_count * n_ref) AS BIGINT)
                   AS contrib,
               row_number() OVER (PARTITION BY j.source
                                  ORDER BY abs(ref_count * n_cur
                                               - cur_count * n_ref) DESC,
                                           bucket) AS rk
        FROM j JOIN tot ON j.source = tot.source
    )
    SELECT source, n_ref, n_cur,
           CASE WHEN n_ref > 0 AND n_cur > 0 THEN
               (1000000 * CAST(sum(contrib) AS BIGINT)) // (2 * n_ref * n_cur)
           END AS tvd_ppm,
           max(CASE WHEN rk = 1 THEN bucket END) AS top_bucket,
           CAST(max(CASE WHEN rk = 1 THEN contrib END) AS BIGINT)
               AS top_contrib
    FROM d GROUP BY source, n_ref, n_cur
    """,
    "WHICH domain moved — the grouped form of q171 (the question a "
    "drift alert actually raises): one row per source with that "
    "domain's exact-integer TVD and its most-drifted bucket "
    "(lm.corpus_drift_by_group). The plant targets only domains "
    "whose numeric suffix is divisible by 3 ('the'->'quantum' on "
    "src0/src3/...), so drifted and quiet domains coexist in one "
    "report — the oracle only hash-matches if per-group histogram "
    "grouping, per-group totals, per-group ranking (contrib desc, "
    "bucket tie-break) and the guard all agree. Windows are "
    "PARTITIONED by source over the <=groups x 1024-row summary "
    "frame; no global ordering wall.",
)
def q172_corpus_drift_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataflow_python_etl_spark.operators.lm import corpus_drift_by_group

    docs = _t(spark, sf_dir, "documents")
    ref = docs.where(_md5_split(0))
    cur = docs.where(_md5_split(1)).withColumn(
        "text",
        F.when(
            F.expr("cast(substr(source, 4) as int) % 3 = 0"),
            F.replace(F.col("text"), F.lit("the"), F.lit("quantum")),
        ).otherwise(F.col("text")),
    )
    return corpus_drift_by_group(ref, cur, buckets=_DRIFT_BUCKETS)


# The registry is re-inserted in numeric key order so dict iteration
# (what the driver's grading window walks) always follows the numeric
# query order, whatever the current upper bound of the registry.
def _sort_registry() -> None:
    # NUMERIC key order — a plain string sort would file "q100" before
    # "q11", shuffling three-digit queries into the driver's first-50
    # grading window and silently changing which rows it grades.
    items = sorted(QUERIES.items(), key=lambda kv: int(kv[0][1:].split("_", 1)[0]))
    QUERIES.clear()
    QUERIES.update(items)


_sort_registry()
