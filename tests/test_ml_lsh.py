"""pyspark.ml LSH wrappers: structural checks + agreement with the
custom oracle-reproducible implementations."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.ml_lsh import (
    brp_similarity_join,
    ml_minhash_candidates,
)
from dataflow_python_etl_spark.queries import QUERIES
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_ml_minhash_finds_planted_near_dups(spark):
    docs = read_table(spark, SF_DIR, "documents")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in ml_minhash_candidates(docs, jaccard_distance_threshold=0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q24_ngram_jaccard_pairs"].fn(spark, SF_DIR).collect()
    }
    # jaccard_dist <= 0.5 ⟺ jaccard >= 0.5 (same threshold, HashingTF
    # collisions aside); the planted near-dups must be found
    assert exact, "corpus should contain planted near-dups"
    assert len(exact & got) >= 0.9 * len(exact)


def test_brp_join_symmetric_and_verified(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    pairs = brp_similarity_join(emb, threshold_euclidean=1.1)
    rows = pairs.collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(r["dist"] <= 1.1 for r in rows)
