"""spark.ml feature pipelines (SURVEY.md §2b text/dedup/similarity
alternates).

The expression-level implementations elsewhere in this repo are the
primary (oracled) paths; these queries cover the ``ml.feature``
API surface the survey names — Tokenizer → HashingTF → IDF,
MinHashLSH, BucketedRandomProjectionLSH — as rows-only checks
(VectorUDT hashing is Spark-specific by construction).

Scale notes: ml transformers are DataFrame→DataFrame and inherit the
same Catalyst execution; `fit()` runs one aggregation job (IDF doc
frequencies, LSH random planes are seeded draws).  Seeds are fixed so
results are Spark-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register


def _tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import Tokenizer

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return Tokenizer(inputCol="text", outputCol="tokens").transform(d)


@register("ml_tfidf_pipeline")  # VectorUDT hashing → rows-only check
def ml_tfidf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer → HashingTF → IDF; top TF-IDF bucket per doc.

    The ml.feature twin of text_tfidf_topk (which is the exact,
    oracled implementation).
    """
    from pyspark.ml.feature import IDF, HashingTF
    from pyspark.ml.functions import vector_to_array

    toks = _tokenized(spark, sf_dir)
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 10).transform(toks)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    scored = idf_model.transform(tf)

    # JVM-side argmax: vector_to_array is a Scala UDF (no Python
    # round-trip) and array_max/array_position are codegen'd
    # expressions — first-max-index like np.argmax, -1 on all-zero
    # vectors, with zero rows leaving the JVM.
    arr = vector_to_array(F.col("tfidf"))
    mx = F.array_max(arr)
    out = scored.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.when(mx > 0.0, (F.array_position(arr, mx) - 1).cast("int"))
        .otherwise(F.lit(-1))
        .alias("bucket"),
        F.when(mx > 0.0, mx).otherwise(F.lit(0.0)).alias("score"),
    )
    return out


@register("ml_minhash_lsh")  # seeded sketch → rows-only check
def ml_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml.feature.MinHashLSH near-dup pairs over hashed-token sets.

    The ml twin of dedup_minhash_lsh (the expression-level primary);
    approxSimilarityJoin does the band-bucket candidate join
    internally.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from project_fauna_spark.functions.shingles import shingles

    # Shingle sets, NOT word sets: word-level Jaccard ≥ 0.5 is so common
    # across same-domain documents that the pair output grows
    # QUADRATICALLY with the corpus (measured: 8.6M pairs at sf0.1 —
    # unusable at any scale).  3-gram shingles match the exact primary
    # (dedup_ngram_jaccard / dedup_minhash_lsh), where 0.5 is a
    # near-duplicate threshold and the output stays corpus-linear.
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles(F.col("text")).alias("tokens")
    )
    cv = CountVectorizer(
        inputCol="tokens", outputCol="features", binary=True, vocabSize=1 << 15
    )
    feats = cv.fit(d).transform(d).filter(F.expr("size(tokens) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.col("jaccard_dist"),
        )
    )


@register("ml_brp_lsh_neighbors")  # seeded planes → rows-only check
def ml_brp_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH approximate neighbors over the
    embeddings table (the ml twin of sim_ann_lsh_bucketed)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(e)
    pairs = model.approxSimilarityJoin(e, e, 1.2, distCol="l2_dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.col("l2_dist"),
        )
    )
