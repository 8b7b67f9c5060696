"""Corpus pipeline composition + iterative dup clustering."""

from dataflow_python_etl_spark.operators.corpus import clean_corpus, dup_clusters
from dataflow_python_etl_spark.queries import QUERIES
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_clean_corpus_removes_near_dups_and_low_quality(spark):
    docs = read_table(spark, SF_DIR, "documents")
    out = clean_corpus(docs)
    n_docs = docs.count()
    survivors = out.count()
    assert 0 < survivors < n_docs
    pairs = QUERIES["q24_ngram_jaccard_pairs"].fn(spark, SF_DIR).collect()
    removed_bs = {p["doc_b"] for p in pairs}
    kept = {r["doc_id"] for r in out.collect()}
    assert kept.isdisjoint(removed_bs)


def test_dup_clusters_match_union_find(spark):
    pairs_df = QUERIES["q24_ngram_jaccard_pairs"].fn(spark, SF_DIR)
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert pairs
    got = {r["node"]: r["cluster"] for r in dup_clusters(pairs_df).collect()}

    # reference union-find on the same edges
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want
