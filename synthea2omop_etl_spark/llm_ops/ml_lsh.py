"""Spark MLlib LSH wrappers — the ecosystem-native alternative to the
expression-based LSH in dedup.py/similarity.py.

- ``brp_near_duplicates`` — BucketedRandomProjectionLSH (euclidean) over
  L2-normalized embeddings: euclidean distance d on unit vectors maps to
  cosine = 1 - d²/2, so a cosine threshold is a distance threshold.
- ``minhash_ml_pairs`` — ml.feature.MinHashLSH over token-set binary
  vectors (HashingTF), approxSimilarityJoin on Jaccard distance.

Both are seeded (deterministic models) and exist so a user of Spark's ML
pipeline API can stay in it; the expression-based variants remain the
default (no model fit, no UDT conversion, plain columnar plans).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
    Normalizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import tokens


def brp_near_duplicates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cosine_threshold: float = 0.4,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold via euclidean LSH on unit vectors.

    Output: (id_a, id_b, cosine) with id_a < id_b. Approximate (LSH recall);
    every returned pair's cosine is exact.
    """
    vecs = df.select(
        F.col(id_col).alias("doc"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("raw"),
    )
    normed = Normalizer(inputCol="raw", outputCol="unit", p=2.0).transform(vecs)
    # cos = 1 - d²/2  ⇒  d = sqrt(2(1-cos))
    dist_threshold = (2.0 * (1.0 - cosine_threshold)) ** 0.5
    model = BucketedRandomProjectionLSH(
        inputCol="unit",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(normed)
    joined = model.approxSimilarityJoin(
        normed, normed, dist_threshold, distCol="dist"
    )
    return (
        joined.where(F.col("datasetA.doc") < F.col("datasetB.doc"))
        .select(
            F.col("datasetA.doc").alias("id_a"),
            F.col("datasetB.doc").alias("id_b"),
            F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 4).alias(
                "cosine"
            ),
        )
    )


def minhash_ml_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.5,
    num_features: int = 1 << 18,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via ml MinHashLSH on hashed token-set vectors.

    Output: (id_a, id_b, jaccard_distance ≤ 1-threshold). NB: HashingTF
    buckets token counts; binary=True makes it a set representation, so the
    Jaccard here is over hashed token sets (collisions ~ n/num_features).
    """
    toks = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    ).where(F.size("toks") > 0)
    tf = HashingTF(
        inputCol="toks", outputCol="vec", numFeatures=num_features, binary=True
    ).transform(toks)
    model = MinHashLSH(
        inputCol="vec", outputCol="hashes", numHashTables=num_hash_tables,
        seed=seed,
    ).fit(tf)
    joined = model.approxSimilarityJoin(
        tf, tf, 1.0 - jaccard_threshold, distCol="jdist"
    )
    return (
        joined.where(F.col("datasetA.doc") < F.col("datasetB.doc"))
        .select(
            F.col("datasetA.doc").alias("id_a"),
            F.col("datasetB.doc").alias("id_b"),
            F.round(1.0 - F.col("jdist"), 4).alias("jaccard"),
        )
    )
