"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() of the result — forces
the full plan without driver-side collect of wide rows). A warm-up
run of the flagship query absorbs JVM/codegen startup so per-query
numbers measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

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
    "q24_revenue_by_nation",
    "q28_fingerprint",
    "q30_ngram_jaccard_pairs",
    "q31_minhash_lsh_pairs",
    "q33_cosine_topk",
    "q34_cosine_pairs_lsh",
    "q37_tumbling_window",
    "q39_sessionize",
    "q43_percentiles",
    "q44_asof_join",
    "q46_tfidf_top_term",
    "q48_ivf_ann",
    "q51_udaf_geomean",
    "q58_clean_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM, codegen, parquet footer caches.
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).count()

    from dataflow_python_etl_spark.operators.dedup import unpersist_all

    results: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        results[name] = dt
        total += dt
        unpersist_all()  # release operator-internal shingle caches
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
