"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() of the result — forces
the full plan without driver-side collect of wide rows) THREE times;
the reported per-query number is the median, so one-time costs
(whole-stage-codegen compilation of the big expression trees, Python
worker spin-up, parquet footer caches) and local run-to-run noise
(±15% observed) don't swamp round-over-round comparisons. Warm-up
runs of the flagship query and a tiny applyInPandas absorb JVM and
Python-worker startup before anything is timed.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from dataflow_python_etl_spark.queries import QUERIES
from dataflow_python_etl_spark.session import get_spark

# Headline set: the reference-core pipeline shapes + the heavy
# extension operators (dedup / similarity / windows) — the queries
# whose plans matter at 100 TB.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_top1_per_group",
    "q04_mart_denorm",
    "q06_obfuscate_names",
    "q10_compensation",
    "q20_revenue_by_nation",
    "q22_fingerprint",
    "q24_ngram_jaccard_pairs",
    "q25_minhash_lsh_pairs",
    "q27_cosine_topk",
    "q28_cosine_pairs_lsh",
    "q31_stream_windows",
    "q32_sessionize",
    "q34_percentiles",
    "q35_asof_join",
    "q37_tfidf_top_term",
    "q39_ivf_ann",
    "q42_custom_aggs",
    "q47_clean_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM, codegen, parquet footer caches, Python workers.
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).count()
    spark.range(32).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf[["id"]].head(1), "id long"
    ).count()

    from dataflow_python_etl_spark.operators.dedup import unpersist_all

    results: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
            unpersist_all()  # release operator-internal shingle caches
        dt = round(sorted(times)[1], 3)  # median of 3
        results[name] = dt
        total += dt
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
