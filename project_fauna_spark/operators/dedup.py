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

import os
import warnings
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.functions.shingles import (
    MAX_SHINGLE_DF,
    drop_hot_shingles,
    shingle_hashes,
    shingles,
)
from project_fauna_spark.functions.vectors import cosine_sim
from project_fauna_spark.operators._oracle_shared import (
    SQL_CC_COMPONENTS as _SQL_CC_COMPONENTS,
    SQL_RARE_SHINGLES as _SQL_RARE_SHINGLES,
    SQL_SHINGLES as _SQL_SHINGLES,
)
from project_fauna_spark.cache import cached
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


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", shingles(F.col("text")).alias("sgl"))


# Back-compat alias — the df-cap helper lives in functions.shingles (a
# non-registering module) so operator modules can share it without
# import cycles through the registry.
_drop_hot_shingles = drop_hot_shingles


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    {_SQL_RARE_SHINGLES},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(ar.rsgl, br.rsgl)) AS n_inter_rare,
             len(list_intersect(a.sgl, b.sgl)) AS n_inter,
             len(a.sgl) AS n_a, len(b.sgl) AS n_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN rare ar ON ar.doc_id = a.doc_id
      JOIN rare br ON br.doc_id = b.doc_id
      WHERE len(list_intersect(ar.rsgl, br.rsgl)) > 0
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
    FROM inter
    WHERE CAST(n_inter_rare AS DOUBLE) / (n_a + n_b - n_inter_rare) >= 0.5
      AND CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5).

    Two-phase (PPJoin-style): (1) candidates via an inverted-index
    self-join over 8-byte shingle HASHES — only docs sharing ≥1
    shingle and passing the size-ratio prune ever pair up, and the
    shuffle carries longs, not gram strings; (2) survivors verified
    with exact string-shingle intersection, so the output is exact.
    The final jaccard is an integer-ratio double (bit-identical across
    engines).
    """
    d = load_table(spark, sf_dir, "documents")
    # Candidate stage runs entirely on 8-byte shingle hashes: the
    # explode, shuffle, and pair aggregation never touch gram strings.
    hashed = d.select("doc_id", shingle_hashes(F.col("text")).alias("hsgl"))
    ex = hashed.select("doc_id", F.size("hsgl").alias("n"), F.explode("hsgl").alias("h"))
    # Both sides of the self-join read the exploded index: persist it
    # so scan+hash+explode run once, not twice (measured 2.6→1.6 s at
    # sf0.1; the cache manager dedupes by logical plan across calls).
    from pyspark.storagelevel import StorageLevel

    ex = cached(ex, StorageLevel.MEMORY_AND_DISK)
    # df-cap the candidate index (hot shingles fan out k²/2 join rows);
    # n stays the FULL set size, so the capped gate only under-, never
    # over-estimates — the exact verify below scores full shingle sets.
    exr = _drop_hot_shingles(ex)
    a, b = exr.alias("a"), exr.alias("b")
    # Size-ratio pruning: jaccard >= t forces t·|A| <= |B| <= |A|/t —
    # applied inside the join so pruned pairs never reach the shuffle.
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n") * 2 >= F.col("a.n"))
            & (F.col("a.n") * 2 >= F.col("b.n")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
        .filter(
            F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    # Exact verification: string shingle sets built ONLY for the
    # (tiny) surviving candidate docs.  cand is persisted (it feeds the
    # id prune AND the verify join) and the corpus is semi-joined down
    # to candidate ids BEFORE the interpreted shingle projection — the
    # r12 optimization round made the plan match this docstring: the
    # old spelling evaluated shingles(text) over the FULL corpus twice
    # (once per join side; plans/r12/dedup_ngram_jaccard_before.txt).
    cand = cached(cand)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        d.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", shingles(F.col("text")).alias("sgl"))
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sgl").alias("sgl_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sgl").alias("sgl_b"))
    n_inter = F.size(F.array_intersect("sgl_a", "sgl_b"))
    jac = n_inter.cast("double") / (F.size("sgl_a") + F.size("sgl_b") - n_inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )



# ---------------------------------------------------------------------------
# MinHash + LSH  (moved home from window_regrade.py after its round-6
# green re-grade — CORRECTNESS_r06.json)
# ---------------------------------------------------------------------------

N_PERM = 32
BAND_SIZE = 4
N_BANDS = N_PERM // BAND_SIZE


def _minhash_lsh_bound_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    truth_sql = ORACLE["dedup_ngram_jaccard"]
    return f"""
    SELECT CAST((SELECT COUNT(*) FROM ({truth_sql}) t) AS BIGINT) AS n_true_pairs,
           TRUE AS lsh_all_verified,
           TRUE AS lsh_recall_ge_half,
           TRUE AS minhash_est_bounded
    """


def _lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production LSH path: sketch → band buckets → candidate pairs
    → exact-Jaccard verification (columns doc_a, doc_b, est_jaccard,
    jaccard, jaccard_check; filtered to jaccard ≥ 0.5).

    Factored out of ``dedup_minhash_lsh`` so the scaling probe can time
    THIS — what a user deduplicating a corpus runs — separately from
    the registered query's graded edge, whose exact-truth recompute
    (the df-capped ngram pair truth) is grading-only cost and was the
    stage that exceeded local disk at 1000× in round 8.

    The 100 TB dedup path: per doc, 32 min-hashes over its shingles
    (one aggregate pass over the inverted index); band hashes bucket
    docs; only bucket collisions become candidate pairs, each verified
    with exact Jaccard ≥ 0.5.  Cost: O(docs·perms) + bucket-local
    pairs — no all-pairs stage anywhere.

    Shuffle discipline: the band self-join ships (doc_id, band_id,
    band_hash) ONLY — 24 bytes/row, not the 32-long signature + the
    shingle array.  The wide sketch table is persisted once and joined
    back BY ID for just the distinct surviving candidates, so sketch
    width never multiplies the band shuffle.

    Spill bounding: FAUNA_LSH_BANDS_IN_FLIGHT=B stages the band join
    into ceil(N_BANDS/B) sequential passes (identical candidate set —
    pinned by tests/test_round9_properties.py); peak in-flight shuffle
    is B/N_BANDS of the single-pass footprint.  See SCALING.md round-9
    addendum for the measured 1000× datapoint this enables locally.
    """
    from pyspark.storagelevel import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", shingle_hashes(F.col("text")).alias("sgl"))
    # Signatures as per-row higher-order expressions: sig[s] =
    # min(xxhash64(shingle_hash, s)) over the doc's shingle-hash ARRAY —
    # no explode, no shuffle; the whole sketch stage is a narrow map.
    sig = sh.select(
        "doc_id",
        "sgl",
        F.array(
            *[
                F.array_min(F.transform("sgl", lambda x: F.xxhash64(x, F.lit(s))))
                for s in range(N_PERM)
            ]
        ).alias("sig"),
    )
    sig = cached(sig, StorageLevel.MEMORY_AND_DISK)

    def band_table(band_ids):
        """Narrow band table for a subset of bands: ids + band key only."""
        return sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.hash(F.slice("sig", b * BAND_SIZE + 1, BAND_SIZE)).alias("band_hash"),
                        )
                        for b in band_ids
                    ]
                )
            ).alias("band"),
        ).select("doc_id", "band.band_id", "band.band_hash")

    def bucket_pairs(bands):
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
        )

    # Band-staged execution (VERDICT r8 item 5): FAUNA_LSH_BANDS_IN_FLIGHT=B
    # processes the bands in ceil(N_BANDS/B) sequential passes, each
    # materializing only its own candidate ids (16-byte rows) to executor
    # disk before the next pass's band shuffle starts — peak in-flight
    # shuffle footprint is B/N_BANDS of the single-pass plan.  The
    # candidate SET is identical (union over bands of bucket collisions,
    # deduped) so results never depend on B.  Default: all bands in one
    # declarative plan — Catalyst sees the whole union and local[32]/a
    # cluster overlaps the band shuffles; staging is the spill-bounding
    # mode for disk-tight single nodes (the local 1000× probe) and for
    # capping concurrent shuffle spill per executor at cluster scale.
    # Validate/clamp the knob (ADVICE r9): non-integer → warn + single-pass
    # fallback; values < 1 clamp to 1 (0 would be a zero range-step, a
    # negative an empty passes list → confusing tracebacks mid-query).
    _bif_raw = os.environ.get("FAUNA_LSH_BANDS_IN_FLIGHT", str(N_BANDS))
    try:
        bif = max(1, int(_bif_raw))
    except ValueError:
        warnings.warn(
            f"FAUNA_LSH_BANDS_IN_FLIGHT={_bif_raw!r} is not an integer; "
            "falling back to single-pass execution",
            stacklevel=2,
        )
        bif = N_BANDS
    if bif >= N_BANDS:
        ids = bucket_pairs(band_table(range(N_BANDS)))
    else:
        passes = []
        for lo in range(0, N_BANDS, bif):
            ids_g = cached(
                bucket_pairs(band_table(range(lo, min(lo + bif, N_BANDS)))),
                StorageLevel.DISK_ONLY,
            )
            ids_g.count()  # run this pass to completion before the next
            passes.append(ids_g)
        ids = reduce(DataFrame.unionByName, passes).dropDuplicates(
            ["doc_a", "doc_b"]
        )
    # Fetch sketches by id for survivors only.
    cands = ids.join(
        sig.select(
            F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), F.col("sgl").alias("sgl_a")
        ),
        "doc_a",
    ).join(
        sig.select(
            F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), F.col("sgl").alias("sgl_b")
        ),
        "doc_b",
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(N_PERM))
    )
    n_inter = F.size(F.array_intersect("sgl_a", "sgl_b"))
    jac = n_inter.cast("double") / (F.size("sgl_a") + F.size("sgl_b") - n_inter)
    # Independent re-derivation of the same exact Jaccard via the union
    # route (|A∩B| = |A|+|B|-|A∪B|): the verification boolean below is
    # computed from THIS expression, not the filter's, so a regression
    # in the filter threshold or its intersect spelling flips the
    # graded boolean instead of being filtered into tautology
    # (ADVICE r7).  Integer set sizes make the two divisions
    # bit-identical when both stages are correct.
    n_union = F.size(F.array_union("sgl_a", "sgl_b"))
    jac_check = (
        (F.size("sgl_a") + F.size("sgl_b") - n_union).cast("double") / n_union
    )
    return cands.select(
        "doc_a",
        "doc_b",
        est.alias("est_jaccard"),
        jac.alias("jaccard"),
        jac_check.alias("jaccard_check"),
    ).filter(F.col("jaccard") >= 0.5)


@register("dedup_minhash_lsh", oracle_builder=_minhash_lsh_bound_oracle)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + LSH(8 bands × 4 rows) near-dup candidates.

    Composes the production path (:func:`_lsh_verified_pairs` — see its
    docstring for the sketch/band/verify design and the
    FAUNA_LSH_BANDS_IN_FLIGHT spill-bounding knob) with the graded edge.

    Graded edge (bound-style, agg_hll_sketch_merge pattern): the band
    assignments are xxhash64-seeded — Spark-deterministic but not
    SQL-portable — so the edge carries the EXACT df-capped ground-truth
    pair count (DuckDB recomputes it) plus three honestly-computed
    quality booleans the oracle emits as literal TRUE: every surviving
    pair re-verifies at Jaccard ≥ 0.5; recall against the exact truth
    is ≥ 0.5 (measured 1.0 at sf0.01 AND sf0.1); every pair's
    signature estimate is within 0.5 of its exact Jaccard (Hoeffding:
    P(miss) ≤ 2e^(-2·32·0.25) ≈ 2e-7 per pair; measured max 0.149).
    An estimator/banding regression flips a boolean and hash-fails.
    """
    # Both pair frames are consumed by TWO aggregates each (stats +
    # n_found for surv; n_truth + n_found for truth): persist the tiny
    # id/score outputs so the band join and the exact-truth candidate
    # pass execute once, not per-consumer — the same fix VERDICT r9
    # applied to ml_minhash_lsh (r12 optimization round; measured
    # before/after in OPTIMIZATION_r12.md).
    surv = cached(_lsh_verified_pairs(spark, sf_dir))

    # Bound-style graded edge: exact truth count + quality booleans
    # (empty-set guards follow the ADVICE-r4 zero-division rule).
    truth = cached(dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b"))
    n_truth = truth.agg(F.count("*").alias("n_true_pairs"))
    stats = surv.agg(
        F.coalesce(F.min(F.col("jaccard_check") >= 0.5), F.lit(True)).alias(
            "lsh_all_verified"
        ),
        F.coalesce(
            F.min(F.abs(F.col("est_jaccard") - F.col("jaccard")) <= 0.5),
            F.lit(True),
        ).alias("minhash_est_bounded"),
    )
    n_found = surv.join(truth, ["doc_a", "doc_b"]).agg(F.count("*").alias("n_found"))
    return (
        n_truth.crossJoin(stats)
        .crossJoin(n_found)
        .select(
            "n_true_pairs",
            "lsh_all_verified",
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_found").cast("double") / F.col("n_true_pairs") >= 0.5,
            )
            .otherwise(F.lit(True))
            .alias("lsh_recall_ge_half"),
            "minhash_est_bounded",
        )
    )


# ---------------------------------------------------------------------------
# SimHash  (moved home from window_regrade.py after its round-6 green
# re-grade)
# ---------------------------------------------------------------------------


@register(
    "dedup_simhash64",
    oracle="""
    SELECT doc_id, TRUE AS bands_recompose, TRUE AS dup_text_same_fp
    FROM documents
    """,
)
def dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document + 16-bit LSH bands.

    One explode + one aggregate: per doc, each word votes ±count on
    each of 64 bit positions of xxhash64(word); the sign vector is the
    fingerprint.  Bands b0..b3 (16 bits each) are the blocking keys —
    two docs within Hamming distance 3 share ≥1 band (pigeonhole).

    Graded edge (bound-style): the fingerprint value is xxhash64-based
    (Spark-deterministic, not SQL-portable), so the edge carries one
    row per document with two honestly-computed invariants the oracle
    emits as literal TRUE: re-composing the four 16-bit bands
    reproduces the fingerprint exactly (pins the band slicing), and
    byte-identical texts received identical fingerprints (pins
    cross-partition determinism of the vote aggregate).  A banding or
    determinism regression flips a boolean and hash-fails; the raw
    fingerprints/bands stay available via the internal frame.

    The determinism window partitions by xxhash64(text), NOT the text
    itself, so the shuffle ships 8-byte keys instead of full documents
    (ADVICE r6).  A 64-bit collision between two DIFFERENT texts would
    make the boolean conservative-false; at graded corpus sizes the
    probability is ~1e-9, and a collision at 100 TB flags for human
    review rather than passing silently — the safe direction.
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
    banded = out.select(
        "doc_id",
        "simhash",
        *[
            F.shiftrightunsigned("simhash", 16 * b).bitwiseAND(mask).alias(f"band{b}")
            for b in range(4)
        ],
    )
    recomposed = None
    for b in range(4):
        term = F.shiftleft(F.col(f"band{b}"), 16 * b)
        recomposed = term if recomposed is None else recomposed.bitwiseOR(term)
    wt = W.partitionBy("text_key")
    return (
        banded.join(
            d.select("doc_id", F.xxhash64("text").alias("text_key")), "doc_id"
        )
        .withColumn("bands_recompose", recomposed == F.col("simhash"))
        .withColumn(
            "dup_text_same_fp",
            F.min("simhash").over(wt) == F.max("simhash").over(wt),
        )
        .select("doc_id", "bands_recompose", "dup_text_same_fp")
    )



# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


# Three 2-bit sign-hyperplane bands over dims (1,2), (3,4), (5,6) —
# a pair is a CANDIDATE if ANY band agrees (OR-amplification).
_SQL_SIGN_BANDS = """[
      (CASE WHEN embedding[1] >= 0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END),
      (CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END),
      (CASE WHEN embedding[5] >= 0 THEN 2 ELSE 0 END) + (CASE WHEN embedding[6] >= 0 THEN 1 ELSE 0 END)
    ]"""


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding, {_SQL_SIGN_BANDS} AS bands
      FROM embeddings
    ),
    x AS (
      SELECT vec_id, label,
             generate_subscripts(bands, 1) AS band_id, unnest(bands) AS bh
      FROM e
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label
      FROM x a JOIN x b
        ON a.label = b.label AND a.band_id = b.band_id AND a.bh = b.bh
       AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b, c.label
    FROM cand c
    JOIN e ea ON ea.vec_id = c.vec_a
    JOIN e eb ON eb.vec_id = c.vec_b
    WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.4, banded sign-LSH blocking.

    Blocking on label alone is O(n²/L) — quadratic at 100 TB when
    label cardinality is low.  This is the hyperplane-LSH banding
    scheme (the cosine twin of MinHash banding): each vector gets 3
    bands of 2 sign bits; candidates are pairs agreeing on label +
    ANY band (OR-amplification keeps recall high where a single
    AND-composed bucket would miss most true pairs at θ ≈ 66°).  The
    candidate join is EQUI on (label, band_id, band_hash) and ships
    IDS ONLY — embeddings are joined back by id for the exact cosine
    verify on the (much smaller) distinct candidate set, so the wide
    vectors never ride the band shuffle.  The oracle blocks on the
    identical CASE-expression bands, so both engines see the same
    candidate set; ids-only output keeps the threshold decision
    stable across engines.
    """
    e = load_table(spark, sf_dir, "embeddings")

    def band_hash(i: int):  # 2 sign bits over dims (2i+1, 2i+2)
        hi = F.when(F.element_at("embedding", 2 * i + 1) >= 0, F.lit(2)).otherwise(F.lit(0))
        lo = F.when(F.element_at("embedding", 2 * i + 2) >= 0, F.lit(1)).otherwise(F.lit(0))
        return hi + lo

    x = e.select(
        "vec_id",
        "label",
        F.posexplode(F.array(*[band_hash(i) for i in range(3)])).alias("band_id", "bh"),
    )
    a = x.select(F.col("vec_id").alias("vec_a"), "label", "band_id", "bh")
    b = x.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("band_id").alias("band_id_b"),
        F.col("bh").alias("bh_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("band_id") == F.col("band_id_b"))
            & (F.col("bh") == F.col("bh_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "label")
        .distinct()
    )
    emb = e.select("vec_id", "embedding")
    return (
        cand.join(emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")), "vec_a")
        .join(emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")), "vec_b")
        .filter(cosine_sim(F.col("emb_a"), F.col("emb_b")) >= 0.4)
        .select("vec_a", "vec_b", "label")
    )


# ---------------------------------------------------------------------------
# Connected-components dedup (iterative min-label propagation)
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 20  # >= max component diameter we'll ever converge over


@register(
    "dedup_connected_components",
    oracle=_SQL_CC_COMPONENTS,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components of the
    3-gram-Jaccard pair graph, component id = min doc_id.

    The principled upgrade of greedy pair-drop dedup (a drops b, b
    drops c — greedy keeps c; components drop the whole chain).
    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels — converges in
    O(component diameter) rounds, bounded at {_CC_MAX_ITERS}; each
    round is ONE shuffle (join labels to edges + min-aggregate).
    Labels and the (tiny) edge set persist across rounds; the
    convergence probe is a scalar count per round, never a data
    collect.  At 100 TB this is the standard large-graph CC loop
    (alternating large-star/small-star has the same per-round shape).
    The oracle computes the same fixpoint declaratively with a
    recursive CTE.
    """
    from pyspark.storagelevel import StorageLevel

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    # Symmetrize with ONE explode instead of unionAll(pairs, pairs):
    # the union spelling references the pair plan twice, so the whole
    # candidate+verify pass under it executed twice when `edges` first
    # materialized (measured: the r12 optimization round; plan diff in
    # plans/r12/dedup_connected_components_{before,after}.txt).  The
    # explode emits exactly the same (src, dst) multiset from a single
    # candidate pass.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # cached() THEN localCheckpoint(): the persist keeps the edge set
    # reusable across invocations in one session (plan-identity cache
    # hits — the warm bench/grading path), while the checkpoint severs
    # the logical lineage so every per-round plan in the loop below is
    # O(loop state), not O(pair-pipeline plan).  Without the truncation
    # each round's analysis/caching re-walks the whole candidate+verify
    # lineage — measured 2-3x the entire query's runtime at sf0.1 (r12;
    # numbers in OPTIMIZATION_r12.md).  This is the standard iterative-
    # algorithm checkpoint (guide §5 "localCheckpoint cuts lineage");
    # rows are unchanged, and the persist in front keeps the checkpoint
    # rebuild cost at one InMemory scan per invocation.
    # Cleanup caveat (ADVICE r12): the checkpoint RDD persists OUTSIDE
    # the cached() registry, and unpersisting checkpointed data by hand
    # is unsafe (lineage is severed — the data IS the frame).  Freeing
    # it therefore RELIES ON ContextCleaner: each invocation builds a
    # fresh checkpoint RDD whose only driver-side reference dies with
    # this function's frame, so driver GC queues the old one for
    # cleanup between queries.  Bounded (one edge-set copy per live
    # invocation), not correctness-affecting; the repeat-invocation
    # test in tests/test_round12_opt_properties.py covers the lifecycle.
    edges = cached(edges, StorageLevel.MEMORY_AND_DISK).localCheckpoint(eager=False)
    d = load_table(spark, sf_dir, "documents")
    # Iterate ONLY over nodes that appear in an edge — near-dup'd docs
    # are a tiny fraction of the corpus, so the per-round join state is
    # |paired docs|, not |corpus|; singletons rejoin at the end.
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = cached(
        nodes.select("doc_id", F.col("doc_id").alias("comp")), StorageLevel.MEMORY_AND_DISK
    )
    for _ in range(_CC_MAX_ITERS):
        nbr_min = (
            labels.join(edges, labels.doc_id == edges.src)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        updated = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "comp"
                ),
                F.col("comp").alias("prev_comp"),
            )
        )
        updated = cached(updated, StorageLevel.MEMORY_AND_DISK)
        n_changed = updated.filter(F.col("comp") != F.col("prev_comp")).count()
        old = labels
        labels = updated.select("doc_id", "comp")
        old.unpersist()
        if n_changed == 0:
            break
    w = W.partitionBy("component_id")
    clustered = labels.select(
        "doc_id", F.col("comp").alias("component_id")
    ).withColumn("n_members", F.count("*").over(w).cast("long"))
    singletons = (
        d.select("doc_id")
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("component_id"),
            F.lit(1).cast("long").alias("n_members"),
        )
    )
    return clustered.unionAll(singletons)


@register(
    "dedup_containment",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    {_SQL_RARE_SHINGLES},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(ar.rsgl, br.rsgl)) AS n_inter_rare,
             len(list_intersect(a.sgl, b.sgl)) AS n_inter,
             len(a.sgl) AS n_a, len(b.sgl) AS n_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN rare ar ON ar.doc_id = a.doc_id
      JOIN rare br ON br.doc_id = b.doc_id
      WHERE len(list_intersect(ar.rsgl, br.rsgl)) > 0
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / LEAST(n_a, n_b) AS containment
    FROM inter
    WHERE CAST(n_inter_rare AS DOUBLE) / LEAST(n_a, n_b) >= 0.7
      AND CAST(n_inter AS DOUBLE) / LEAST(n_a, n_b) >= 0.7
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric (min-side) containment near-dup pairs (threshold 0.7).

    Jaccard misses subset relationships — a document pasted inside a
    much longer one scores low on union-normalized overlap but 1.0 on
    containment.  Same two-phase plan as ``dedup_ngram_jaccard``
    (hashed inverted-index candidates → exact string verify on the
    survivors), but WITHOUT the size-ratio prune: containment is
    size-asymmetric by design, so only the shared-shingle requirement
    bounds candidates.  The final value is an integer-ratio double."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", shingle_hashes(F.col("text")).alias("hsgl"))
    ex = hashed.select("doc_id", F.size("hsgl").alias("n"), F.explode("hsgl").alias("h"))
    from pyspark.storagelevel import StorageLevel

    ex = cached(ex, StorageLevel.MEMORY_AND_DISK)
    # df-cap as in dedup_ngram_jaccard; sizes stay full-set, so the
    # capped gate under-estimates and the exact verify keeps the edge.
    exr = _drop_hot_shingles(ex)
    a, b = exr.alias("a"), exr.alias("b")
    cand = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
        .filter(
            F.col("n_inter").cast("double") / F.least("n_a", "n_b") >= 0.7
        )
        .select("doc_a", "doc_b")
    )
    # Same candidate-bounded verify as dedup_ngram_jaccard (r12): pin
    # the tiny pair set, semi-join the corpus down to candidate ids,
    # THEN build the string shingle sets — not two full-corpus passes.
    cand = cached(cand)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        d.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", shingles(F.col("text")).alias("sgl"))
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sgl").alias("sgl_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sgl").alias("sgl_b"))
    n_inter = F.size(F.array_intersect("sgl_a", "sgl_b"))
    cont = n_inter.cast("double") / F.least(F.size("sgl_a"), F.size("sgl_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= 0.7)
    )


# --------------------------------------------------------------------------
# dedup_paragraph_hash — C4-style paragraph-granular dedup
# (moved home from extras8 after its round-7 driver grade, the
# moved-home rotation convention — see plans/__init__ docstring)
# --------------------------------------------------------------------------


@register(
    "dedup_paragraph_hash",
    oracle="""
    WITH paras AS (
      SELECT doc_id, md5(unnest(string_split(text, '. '))) AS ph
      FROM documents
    ),
    df AS (
      SELECT ph, COUNT(DISTINCT doc_id) AS n_docs FROM paras GROUP BY ph
    )
    SELECT p.doc_id,
           COUNT(*) AS n_paras,
           CAST(COUNT(*) FILTER (WHERE df.n_docs > 1) AS BIGINT) AS n_dup_paras,
           CAST(COUNT(*) FILTER (WHERE df.n_docs > 1) AS DOUBLE) / COUNT(*)
             AS dup_frac,
           COUNT(*) FILTER (WHERE df.n_docs > 1) * 2 > COUNT(*) AS drop_doc
    FROM paras p JOIN df ON df.ph = p.ph
    GROUP BY p.doc_id
    """,
)
def dedup_paragraph_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular dedup (the C4/RefinedWeb recipe): split each
    document into paragraphs, md5 each, and flag documents where more
    than half the paragraphs also appear in OTHER documents —
    boilerplate and syndicated content that document-level exact dedup
    misses entirely.

    md5 is the SQL-portable digest twin (``dedup_simhash_md5``
    convention), so the graded edge carries real counts, not booleans.
    Scale: the explode ships (doc_id, 16-byte digest) only; the
    cross-doc frequency is one map-combined digest aggregate; the
    verdict is an integer cross-multiplication (no float threshold).
    At 100 TB this is the same inverted-index discipline as the
    shingle dedup — a hot boilerplate paragraph costs one aggregate
    row, never a pair explosion, because the query joins paragraphs
    back to their docs (linear), not docs to docs (quadratic).
    """
    d = load_table(spark, sf_dir, "documents")
    paras = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\. ")).alias("para")
    ).select("doc_id", F.md5(F.col("para")).alias("ph"))
    paras = cached(paras)
    df_p = paras.groupBy("ph").agg(F.countDistinct("doc_id").alias("n_docs"))
    joined = paras.join(df_p, "ph")
    dup = (F.col("n_docs") > 1).cast("long")
    agg = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(dup).cast("long").alias("n_dup_paras"),
    )
    return agg.select(
        "doc_id",
        "n_paras",
        "n_dup_paras",
        (F.col("n_dup_paras").cast("double") / F.col("n_paras")).alias("dup_frac"),
        (F.col("n_dup_paras") * 2 > F.col("n_paras")).alias("drop_doc"),
    )
