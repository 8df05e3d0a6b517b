"""Round-6 batch 42: cross-document boilerplate mining and byte-level
uniformity triage.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# dedup_boilerplate_ngrams — what text does EVERYONE repeat?
# --------------------------------------------------------------------------

_BP_TOP = 20


def _boilerplate_oracle() -> str:
    from project_fauna_spark.functions.shingles import GRAM_K as _GRAM_K
    from project_fauna_spark.operators._oracle_shared import sql_token_grams_cte

    return f"""
    WITH g AS ({sql_token_grams_cte(_GRAM_K)}),
    agg AS (
      SELECT md5(gram) AS gram_digest,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(MIN(doc_id) AS BIGINT) AS example_doc
      FROM g GROUP BY 1
      HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT gram_digest, n_docs, n_occurrences, example_doc
    FROM agg ORDER BY n_docs DESC, n_occurrences DESC, gram_digest
    LIMIT {_BP_TOP}
    """


@register("dedup_boilerplate_ngrams", oracle_builder=_boilerplate_oracle)
def dedup_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-20 BOILERPLATE n-grams: 8-token windows ranked by how
    many distinct documents contain them — headers, footers, license
    blurbs, navigation text: the corpus-wide removal list an
    exact-substring cleaner (Lee et al. 2022) is built from
    (``dedup_exact_substring`` scores each DOCUMENT's duplicated
    share; this surfaces the shared fragments themselves, reusing the
    same ``curation._token_grams`` window builder so the two stages
    can never disagree about what a window is).

    The shuffle carries (doc_id, 16-byte md5 of the window), never
    window text; ranking is TakeOrdered 20 under the total
    (n_docs, n_occurrences, digest) order.  Scale: one map-combined
    digest aggregate over the corpus-linear gram explode — a hot
    boilerplate fragment is one aggregate row, never a pair
    explosion.
    """
    from project_fauna_spark.functions.shingles import token_grams as _token_grams

    g = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_token_grams(F.col("text"))).alias("gram")
    )
    agg = (
        g.select("doc_id", F.md5(F.col("gram")).alias("gram_digest"))
        .groupBy("gram_digest")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return agg.orderBy(
        F.col("n_docs").desc(), F.col("n_occurrences").desc(), "gram_digest"
    ).limit(_BP_TOP)


# --------------------------------------------------------------------------
# mm_byte_uniformity_audit — text, or compressed/encrypted blob?
# --------------------------------------------------------------------------


@register(
    "mm_byte_uniformity_audit",
    # χ² against the uniform byte distribution, all-integer numerator:
    # Σ_b (256·c_b − n)² over ALL 256 byte values — absent bytes
    # contribute n² each, so U = Σ_present(256c−n)² + (256−k)·n² and
    # χ² = U / (256·n) is ONE division of exact integers.
    oracle="""
    WITH s AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents
      WHERE octet_length(encode(text)) = length(text) AND length(text) > 0
    ),
    b AS (
      SELECT s.doc_id, s.n,
             unicode(substring(s.text, CAST(g.i AS INT), 1)) AS v
      FROM s, LATERAL (SELECT unnest(range(1, s.n + 1)) AS i) g
    ),
    c AS (
      SELECT doc_id, n, v, CAST(COUNT(*) AS BIGINT) AS cb
      FROM b GROUP BY 1, 2, 3
    ),
    u AS (
      SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples,
             CAST(COUNT(*) AS BIGINT) AS distinct_bytes,
             SUM(CAST((256 * cb - n) AS HUGEINT) * (256 * cb - n))
               AS u_present
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n_samples, distinct_bytes,
           CAST(u_present
                + (256 - distinct_bytes) * n_samples * n_samples AS DOUBLE)
             / CAST(256 * n_samples AS DOUBLE) AS chi2_uniform
    FROM u
    """,
)
def mm_byte_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram uniformity χ² per payload — the classic
    compressed/encrypted-blob detector: plain text concentrates on a
    few dozen byte values (huge χ² against uniform), while ciphertext
    and compressed media sit near χ² ≈ 255 — the one-pass triage that
    routes payloads to the right decoder and flags data that should
    NOT be readable (``mm_binary_meta`` reads declared type; this
    reads the bytes' own statistics).

    All-integer numerator via cross-multiplication (256·c − n, never
    the fractional expectation), absent byte values folded in as a
    closed form, ONE IEEE division at the edge.  Scale: bytes explode
    to doc-keyed rows (the ``mm_signal_features`` shape), then two
    map-combined aggregates — a petabyte of payloads streams through
    with 256 counters per document in flight.
    """
    d0 = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.length("text") == F.octet_length("text")) & (F.length("text") > 0)
        )
        .select("doc_id", F.length("text").alias("n"), "text")
    )
    b = d0.select(
        "doc_id",
        "n",
        F.explode(F.split("text", "")).alias("ch"),
    ).select("doc_id", "n", F.ascii("ch").cast("long").alias("v"))
    c = b.groupBy("doc_id", "n", "v").agg(F.count("*").alias("cb"))
    dev = F.lit(256) * F.col("cb") - F.col("n")
    u = c.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_samples"),
        F.count("*").alias("distinct_bytes"),
        F.sum((dev.cast("decimal(19,0)") * dev)).alias("u_present"),
    )
    total = F.col("u_present").cast("decimal(38,0)") + (
        F.lit(256) - F.col("distinct_bytes")
    ).cast("decimal(38,0)") * F.col("n_samples") * F.col("n_samples")
    return u.select(
        "doc_id",
        "n_samples",
        "distinct_bytes",
        (
            total.cast("double")
            / (F.lit(256) * F.col("n_samples")).cast("double")
        ).alias("chi2_uniform"),
    )
