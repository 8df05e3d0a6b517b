"""Deduplication operators for LLM-training-data pipelines.

Five dedup families over the ``documents`` (and ``embeddings``) tables:
exact, blocked-exact, n-gram Jaccard, MinHash+LSH, SimHash — plus
embedding-cosine near-dup.  The reference has no dedup (its README
lists it as future work, /root/reference/README.md:151-158); this is
north-star surface (SURVEY.md §2b dedup).

Scale design (100 TB):

* Exact dedup is a hash groupBy on the dedup key — one shuffle,
  map-side combined.  Never ``dropDuplicates()`` on the full row when a
  deterministic survivor is needed: ``min(doc_id)`` per key is
  reproducible, first-encountered is not.
* N-gram Jaccard joins docs *through the inverted shingle index*
  (explode → self-join on shingle → count) — never an all-pairs cross
  join.  Candidate pairs are bounded by shared-shingle pairs.
* MinHash-LSH replaces even that with band-bucket collisions: cost is
  O(docs × perms) + bucket-local pairs.  This is the 100 TB path; the
  shingle-join is the exactness baseline it's validated against.
* SimHash is a single aggregate pass (one 64-bit fingerprint per doc);
  near-dup candidates come from equality joins on 16-bit bands
  (Hamming ≤ 3 guarantees a matching band by pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_text",
    oracle="""
    SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on full text: deterministic survivor = min(doc_id).

    One hash-aggregate shuffle; at 100 TB, group on xxhash64(text)
    first to shrink shuffle width, then resolve rare collisions.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    )


@register(
    "dedup_exact_blocked",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang,
             array_to_string((string_split(text, ' '))[1:8], ' ') AS block_key
      FROM documents
    )
    SELECT lang, block_key, CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS group_size
    FROM keyed GROUP BY lang, block_key
    """,
)
def dedup_exact_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked dedup: normalize to a (lang, 8-word-prefix) key.

    The blocking-key pattern: cheap normalization buckets likely
    duplicates; survivors again deterministic by min(doc_id).
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            "lang",
            F.array_join(F.slice(words, 1, 8), " ").alias("block_key"),
        )
        .groupBy("lang", "block_key")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("group_size"))
    )


# ---------------------------------------------------------------------------
# Shingles (shared by Jaccard / MinHash / SimHash)
# ---------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (built-ins only)."""
    words = F.split(text, " ")
    k = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.array_distinct(grams)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", shingles(F.col("text")).alias("sgl"))


_SQL_SHINGLES = """
      SELECT doc_id,
             list_distinct([array_to_string(ws[i:i+2], ' ')
                            for i in range(1, len(ws) - 1)]) AS sgl
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
"""


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sgl, b.sgl)) AS n_inter,
             len(a.sgl) AS n_a, len(b.sgl) AS n_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sgl, b.sgl)) > 0
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
    FROM inter
    WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5).

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count matches per pair — candidate pairs are only those
    sharing ≥1 shingle, never an all-pairs product.  The final jaccard
    is an integer-ratio double (bit-identical across engines).
    """
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("sgl").alias("n_sgl"))
    ex = sh.select("doc_id", F.explode("sgl").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sgl").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sgl").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_PERM = 32
BAND_SIZE = 4
N_BANDS = N_PERM // BAND_SIZE


@register("dedup_minhash_lsh")  # hash-seeded sketch → rows-only check
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + LSH(8 bands × 4 rows) near-dup candidates.

    The 100 TB dedup path: per doc, 32 min-hashes over its shingles
    (one aggregate pass over the inverted index); band hashes bucket
    docs; only bucket collisions become candidate pairs, each verified
    with exact Jaccard ≥ 0.5.  Cost: O(docs·perms) + bucket-local
    pairs — no all-pairs stage anywhere.  xxhash64-seeded → Spark-
    deterministic, not SQL-portable → rows-only check.
    """
    sh = _doc_shingles(spark, sf_dir)
    ex = sh.select("doc_id", F.explode("sgl").alias("shingle"))
    sig = ex.groupBy("doc_id").agg(
        F.array(
            *[F.min(F.xxhash64("shingle", F.lit(s))).alias(f"h{s}") for s in range(N_PERM)]
        ).alias("sig")
    )
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(F.slice("sig", b * BAND_SIZE + 1, BAND_SIZE)).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(N_PERM))
    )
    cands = cands.select("doc_a", "doc_b", est.alias("est_jaccard"))
    # Verify candidates with exact jaccard (tiny set after LSH).
    sizes = _doc_shingles(spark, sf_dir).select(
        "doc_id", F.col("sgl"), F.size("sgl").alias("n_sgl")
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("sgl").alias("sgl_a"), F.col("n_sgl").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("sgl").alias("sgl_b"), F.col("n_sgl").alias("n_b")
    )
    verified = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sgl_a", "sgl_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    return verified.select("doc_a", "doc_b", "est_jaccard", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


@register("dedup_simhash64")  # hash-based fingerprint → rows-only check
def dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document + 16-bit LSH bands.

    One explode + one aggregate: per doc, each word votes ±count on
    each of 64 bit positions of xxhash64(word); the sign vector is the
    fingerprint.  Bands b0..b3 (16 bits each) are the blocking keys —
    two docs within Hamming distance 3 share ≥1 band (pigeonhole).
    Hash-based → rows-only check.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    h = F.xxhash64("word")
    bit_votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"v{i}")
        for i in range(64)
    ]
    votes = words.groupBy("doc_id").agg(*bit_votes)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    out = votes.select("doc_id", fp.alias("simhash"))
    mask = F.lit((1 << 16) - 1).cast("long")
    return out.select(
        "doc_id",
        "simhash",
        *[
            F.shiftrightunsigned("simhash", 16 * b).bitwiseAND(mask).alias(f"band{b}")
            for b in range(4)
        ],
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, double math.

    Index-ordered fold (``F.aggregate``) — deterministic, JVM-side,
    no UDF.
    """
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    nb = F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    return dot / F.sqrt(na * nb)


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.4 within a label block.

    Label is the blocking key (same pattern as LSH buckets at scale:
    candidates only within a partitionable block, never all-pairs).
    Output is ids-only: the threshold decision is stable across engines
    even when the last float ulps differ.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("emb_a")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("embedding").alias("emb_b")
    )
    pairs = a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
    return (
        pairs.withColumn("cos", cosine_sim(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= 0.4)
        .select("vec_a", "vec_b", "label")
    )
