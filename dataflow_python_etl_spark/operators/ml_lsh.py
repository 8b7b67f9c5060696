"""pyspark.ml-backed LSH operators — the built-in alternative to the
hand-rolled LSH in ``operators/similarity.py`` / ``operators/dedup.py``.

SURVEY.md §2.4 names ``MinHashLSH`` / ``BucketedRandomProjectionLSH``
as the stock Spark answer for similarity search. We keep BOTH tiers:
the custom expression-level LSH is oracle-reproducible (fixed literal
hyperplanes → DuckDB can mirror bucket assignment), while these
ml-backed versions use Spark's own estimators — less code, JVM-side
hashing, but engine-private hash seeds, so their outputs are checked
structurally (tests) rather than against the cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _to_ml_vector(df: DataFrame, vec_col: str, out_col: str = "features") -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(vec_col).cast("array<double>")))


def brp_similarity_join(
    df: DataFrame,
    threshold_euclidean: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 7,
) -> DataFrame:
    """All pairs within a Euclidean distance via
    ``BucketedRandomProjectionLSH.approxSimilarityJoin``.

    Returns (id_a, id_b, dist) with id_a < id_b. Distance is exact on
    the emitted candidates (Spark verifies candidates exactly, like
    our custom LSH path).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    v = _to_ml_vector(df.select(id_col, vec_col), vec_col)
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = brp.fit(v)
    joined = model.approxSimilarityJoin(v, v, threshold_euclidean, distCol="dist")
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("dist", 6).alias("dist"),
        )
    )


def ml_minhash_candidates(
    df: DataFrame,
    jaccard_distance_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Near-dup candidate pairs via ``MinHashLSH`` over a sparse
    shingle-presence vector (HashingTF). Returns
    (doc_a, doc_b, jaccard_dist)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from dataflow_python_etl_spark.functions.text import shingles

    base = df.select(
        F.col(id_col), shingles(text_col, n).alias("shs")
    ).where(F.size("shs") > 0)
    tf = HashingTF(inputCol="shs", outputCol="features", numFeatures=1 << 18)
    v = tf.transform(base)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(v)
    joined = model.approxSimilarityJoin(v, v, jaccard_distance_threshold, distCol="jaccard_dist")
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
