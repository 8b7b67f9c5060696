"""Streaming load bench (VERDICT r10 #4): docs/s through the two
production streaming sinks — ``stream_dedup_ingest`` (watermark
guard + catalog-bucketed band index, the 100 TB configuration) and
``stream_docs_to_search_index`` — fed the sf0.1 documents table as
N sequential micro-batches.

Method: docs are split into N equal contiguous doc_id ranges
(monotone ids — the watermark guard's contract); each batch is
written as ONE parquet file into the file source dir (atomic
visibility — the round-9 multi-part-rename pitfall) and
``processAllAvailable()`` is timed after each write, so batch k's
wall clock covers exactly one micro-batch of work against a corpus
already holding batches 0..k-1.

What transfers to a cluster is the SHAPE, not the local numbers:

- per-batch wall must stay ~flat as the ingested corpus grows (the
  sinks' documented claim: per-batch cost scales with the BATCH —
  semi-join-pruned verification, co-located bucketed index probe,
  O(1) watermark guard). Asserted as last-batch <= FLAT_RATIO x the
  median of the earlier steady-state batches.
- dedup index rows must equal bands_per_doc x survivors EXACTLY
  (growth proportional to the corpus, never to batches x corpus).
- guard/ledger state must stay O(1) bytes per sink (watermark file,
  search stats sidecar) regardless of stream length.

Prints ONE JSON line (the driver-tail contract); full per-batch
detail lands in BENCH_STREAMING.json, which the next bench.py run
folds into BENCH_FULL.json under "streaming".
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import duckdb

N_BATCHES = 8
FLAT_RATIO = 5.0  # loose: catches corpus-proportional growth, not noise
DEDUP_BANDS_PER_DOC = 32 // 4  # num_perm / rows_per_band defaults


def _pq_count(path: str) -> int:
    con = duckdb.connect()
    try:
        return con.execute(
            f"SELECT count(*) FROM read_parquet('{path}/**/*.parquet')"
        ).fetchone()[0]
    finally:
        con.close()


def _sidecar_bytes(path: str) -> int:
    """Total size of non-parquet state files for a sink root: the
    watermark file (a `.__`-suffixed sibling) + any `_`-prefixed
    sidecars inside the table."""
    total = 0
    parent, base = os.path.split(path.rstrip("/"))
    for sib in os.listdir(parent):
        if sib.startswith(base + ".__"):
            p = os.path.join(parent, sib)
            if os.path.isfile(p):
                total += os.path.getsize(p)
    for root, _, files in os.walk(path):
        for fn in files:
            if fn.startswith("_") and not fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def _feed(spark, df, src: str, first: bool) -> None:
    mode = "overwrite" if first else "append"
    df.coalesce(1).write.mode(mode).parquet(src)


def _flat_check(name: str, walls: list[float]) -> float:
    """Ratio of the last batch to the median of the steady-state
    middle batches (batch 0 pays Python-worker/codegen warmup)."""
    mid = sorted(walls[1:-1])
    med = mid[len(mid) // 2]
    ratio = walls[-1] / med if med > 0 else 1.0
    assert ratio <= FLAT_RATIO, (
        f"{name}: last-batch wall {walls[-1]:.2f}s is {ratio:.1f}x the "
        f"steady-state median {med:.2f}s — per-batch cost is growing "
        "with the corpus, which breaks the sink's scale contract"
    )
    return round(ratio, 2)


def bench_dedup_ingest(spark, docs, base: str) -> dict:
    from dataflow_python_etl_spark.streaming.pipeline import stream_dedup_ingest

    src = os.path.join(base, "in")
    corpus = os.path.join(base, "corpus")
    index = os.path.join(base, "index")
    n_docs = docs.count()
    step = (n_docs + N_BATCHES - 1) // N_BATCHES
    walls, index_rows, corpus_rows, state_bytes = [], [], [], []
    q = None
    for k in range(N_BATCHES):
        batch = docs.where(
            (docs.doc_id >= k * step) & (docs.doc_id < (k + 1) * step)
        ).select("doc_id", "text")
        _feed(spark, batch, src, first=(k == 0))
        t0 = time.perf_counter()
        if q is None:
            q = stream_dedup_ingest(
                spark.readStream.schema("doc_id long, text string").parquet(src),
                corpus,
                index,
                os.path.join(base, "ckpt"),
                index_table="bix_bench_streaming",
                index_buckets=32,
                replay_guard="watermark",
            )
        q.processAllAvailable()
        walls.append(round(time.perf_counter() - t0, 3))
        corpus_rows.append(_pq_count(corpus))
        index_rows.append(_pq_count(index))
        state_bytes.append(_sidecar_bytes(corpus))
    q.stop()
    spark.sql("DROP TABLE IF EXISTS bix_bench_streaming")
    # growth contract: index rows == bands_per_doc x survivors, exact
    for c, i in zip(corpus_rows, index_rows):
        assert i == DEDUP_BANDS_PER_DOC * c, (
            f"band index rows {i} != {DEDUP_BANDS_PER_DOC} x {c} survivors "
            "— index growth decoupled from the corpus"
        )
    assert max(state_bytes) <= 4096, (
        f"watermark/guard state grew to {max(state_bytes)} bytes — the O(1) "
        "guard-state contract is broken"
    )
    proc = sum(walls)
    return {
        "docs_per_s": round(n_docs / proc, 1),
        "total_wall_s": round(proc, 3),
        "n_docs": n_docs,
        "n_batches": N_BATCHES,
        "survivors": corpus_rows[-1],
        "index_rows": index_rows[-1],
        "state_bytes_max": max(state_bytes),
        "batch_walls": walls,
        "flat_ratio_last_vs_median": _flat_check("dedup_ingest", walls),
    }


def bench_search_index(spark, docs, base: str) -> dict:
    from dataflow_python_etl_spark.streaming.pipeline import (
        stream_docs_to_search_index,
    )

    src = os.path.join(base, "in")
    path = os.path.join(base, "search_index")
    n_docs = docs.count()
    step = (n_docs + N_BATCHES - 1) // N_BATCHES
    walls, rows, state_bytes = [], [], []
    q = None
    for k in range(N_BATCHES):
        batch = docs.where(
            (docs.doc_id >= k * step) & (docs.doc_id < (k + 1) * step)
        ).select("doc_id", "text")
        _feed(spark, batch, src, first=(k == 0))
        t0 = time.perf_counter()
        if q is None:
            q = stream_docs_to_search_index(
                spark.readStream.schema("doc_id long, text string").parquet(src),
                path,
                os.path.join(base, "ckpt"),
            )
        q.processAllAvailable()
        walls.append(round(time.perf_counter() - t0, 3))
        rows.append(_pq_count(path))
        state_bytes.append(_sidecar_bytes(path))
    q.stop()
    from dataflow_python_etl_spark.operators.search import load_search_stats

    stats = load_search_stats(path)
    assert stats["n_docs"] == n_docs, (
        f"stats sidecar counts {stats['n_docs']} docs, fed {n_docs}"
    )
    # postings grow additively: every batch adds its own rows, none
    # are rewritten (strictly increasing across non-empty batches)
    assert all(b > a for a, b in zip(rows, rows[1:])), rows
    assert max(state_bytes) <= 4096, (
        f"stats-sidecar state grew to {max(state_bytes)} bytes"
    )
    proc = sum(walls)
    return {
        "docs_per_s": round(n_docs / proc, 1),
        "total_wall_s": round(proc, 3),
        "n_docs": n_docs,
        "n_batches": N_BATCHES,
        "postings_rows": rows[-1],
        "state_bytes_max": max(state_bytes),
        "batch_walls": walls,
        "flat_ratio_last_vs_median": _flat_check("search_index", walls),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.session import get_spark
    from dataflow_python_etl_spark.sources.catalog import read_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bench_streaming", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # warm the Python-worker pool + codegen paths once (round-8 pitfall)
    docs.limit(32).groupBy((F.col("doc_id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf[["doc_id"]].head(1), "doc_id long"
    ).count()

    report: dict = {"metric": "streaming_docs_per_s", "unit": "docs/s"}
    work = tempfile.mkdtemp(prefix="bench_streaming_")
    try:
        for name, fn in [
            ("dedup_ingest", bench_dedup_ingest),
            ("search_index", bench_search_index),
        ]:
            sub = os.path.join(work, name)
            os.makedirs(sub)
            report[name] = fn(spark, docs, sub)
            unpersist_all()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    report["value"] = report["dedup_ingest"]["docs_per_s"]
    m = os.path.basename(sf_dir.rstrip("/"))
    report["sf"] = float(m[2:]) if m.startswith("sf") else -1.0
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_STREAMING.json"),
        "w",
    ) as f:
        json.dump(report, f, indent=1)
    line = json.dumps(
        {
            k: (
                {kk: vv for kk, vv in v.items() if kk != "batch_walls"}
                if isinstance(v, dict)
                else v
            )
            for k, v in report.items()
        }
    )
    assert len(line) < 1900, f"stdout line {len(line)} chars (driver cap 2000)"
    print(line)


if __name__ == "__main__":
    main()
