"""Round-6 batch 23: event-type audience overlap and perceptual-hash
media dedup.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# event_audience_overlap — which behaviors share an audience?
# --------------------------------------------------------------------------


@register(
    "event_audience_overlap",
    oracle="""
    WITH e AS (SELECT DISTINCT event_type, user_id FROM events),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
    i AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT sa.event_type AS type_a, sb.event_type AS type_b,
           sa.n AS users_a, sb.n AS users_b,
           COALESCE(i.c, 0) AS n_common,
           CAST(COALESCE(i.c, 0) AS DOUBLE)
             / CAST(sa.n + sb.n - COALESCE(i.c, 0) AS DOUBLE) AS jaccard,
           CAST(COALESCE(i.c, 0) AS DOUBLE)
             / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment
    FROM s sa
    JOIN s sb ON sa.event_type < sb.event_type
    LEFT JOIN i ON i.ta = sa.event_type AND i.tb = sb.event_type
    """,
)
def event_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: for every
    unordered type pair, the two audience sizes, the shared-user count,
    and Jaccard / containment of the user sets — the "do purchasers
    also view?" audience-venn that drives funnel design and feature
    cross-sell analysis.  The full matrix is emitted, zero-overlap
    pairs included.

    Shape: one map-combined distinct over (event_type, user_id), then
    an inverted-index equi self-join on ``user_id`` (the
    ``graph_common_neighbors`` convention — NEVER all-pairs over
    users: per-user fan-out is bounded by deg² ≤ |types|²).  The
    type-size matrix and the intersection table are broadcast —
    both are |types|-sized.  Jaccard and containment are ONE IEEE
    division of exact integers each, so bit-equal cross-engine with
    no decimal routing.
    """
    e = cached(
        load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    )
    s = e.groupBy("event_type").agg(F.count("*").alias("n"))
    inter = (
        e.select(F.col("event_type").alias("ta"), "user_id")
        .join(e.select(F.col("event_type").alias("tb"), "user_id"), "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("c"))
    )
    sa = s.select(F.col("event_type").alias("type_a"), F.col("n").alias("users_a"))
    sb = s.select(F.col("event_type").alias("type_b"), F.col("n").alias("users_b"))
    nc = F.coalesce(F.col("c"), F.lit(0)).cast("long")
    return (
        sa.join(F.broadcast(sb), F.col("type_a") < F.col("type_b"))
        .join(
            F.broadcast(inter),
            (F.col("type_a") == F.col("ta")) & (F.col("type_b") == F.col("tb")),
            "left",
        )
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            nc.alias("n_common"),
            (
                nc.cast("double")
                / (F.col("users_a") + F.col("users_b") - nc).cast("double")
            ).alias("jaccard"),
            (
                nc.cast("double")
                / F.least("users_a", "users_b").cast("double")
            ).alias("containment"),
        )
    )


# --------------------------------------------------------------------------
# mm_phash_dedup — perceptual-hash near-dup detection over decoded media
# --------------------------------------------------------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)


@register(
    "mm_phash_dedup",
    # The aHash is fully deterministic from the payload bytes, so
    # DuckDB replays the codec math exactly: the encoder pads the
    # payload to height·192 bytes (height = ceil(n/192), min 1), the
    # 64-cell "downscale" splits that stream into 64 contiguous chunks
    # of height·3 bytes, and bit i is the INTEGER comparison
    # cell_sum·64 > total_sum — no float anywhere, the hash is a
    # 64-char '0'/'1' string.  Payloads are ASCII (unicode(char) ==
    # byte value); the WHERE enforces that symmetrically with the
    # Spark side's length == octet_length filter (the mm_frame_sample
    # convention), so non-ASCII docs drop on BOTH sides.
    oracle="""
    WITH b AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             GREATEST(1, CAST(ceil(octet_length(encode(text)) / 192.0) AS BIGINT))
               AS height
      FROM documents
      WHERE octet_length(encode(text)) = length(text)
    ),
    cs AS (
      SELECT b.doc_id, g.i // (b.height * 3) AS cell,
             CAST(SUM(CASE WHEN g.i + 1 <= b.n
                           THEN unicode(substring(b.text, CAST(g.i + 1 AS INT), 1))
                           ELSE 0 END) AS BIGINT) AS s
      FROM b, LATERAL (SELECT unnest(range(0, b.height * 192)) AS i) g
      GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS t FROM cs GROUP BY 1),
    h AS (
      SELECT cs.doc_id,
             string_agg(CASE WHEN cs.s * 64 > tot.t THEN '1' ELSE '0' END,
                        '' ORDER BY cs.cell) AS phash
      FROM cs JOIN tot USING (doc_id)
      GROUP BY cs.doc_id
    )
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_redundant,
           MIN(doc_id) AS min_doc_id
    FROM h GROUP BY phash
    """,
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (average-hash / aHash) dedup over REAL decoded
    rasters: payload → valid 24-bit BMP → header-parsed pixel array →
    64-cell downscale → 1 bit per cell (cell mean > global mean) →
    group by the 64-bit hash.  Identical media collide exactly;
    near-identical media (small byte-level perturbations) usually
    collide too — the classic image-dedup first pass that runs BEFORE
    any expensive embedding model.

    The hash is computed in one Arrow ``mapInPandas`` stage (encode →
    decode → numpy integer cell sums; bit i is the exact integer test
    ``cell_sum·64 > total_sum``, so no float enters the hash), and the
    shuffle that follows carries only (doc_id, 64-char hash) — never
    media bytes (the ``mm_integrity_rollup`` rule).  Swap the BMP
    round-trip for PIL + a real 8×8 resize and ONLY the Pandas
    function body changes.  Scale: one decode pass, one
    digest-keyed aggregate — the same plan as exact hash dedup.
    """
    import struct

    import numpy as np
    import pandas as pd

    from project_fauna_spark.operators.multimodal import _encode_bmp, _payloads

    p = (
        _payloads(spark, sf_dir)
        .filter(F.length("text") == F.octet_length("text"))
        .select("doc_id", "payload")
    )

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = _encode_bmp(bytes(payload))
                # REAL decode: geometry from BITMAPINFOHEADER.
                pixel_offset = struct.unpack_from("<I", data, 10)[0]
                width, height = struct.unpack_from("<ii", data, 18)
                pixels = np.frombuffer(data, dtype=np.uint8, offset=pixel_offset)
                cells = pixels.reshape(64, abs(height) * 3).sum(
                    axis=1, dtype=np.int64
                )
                total = int(cells.sum())
                bits = "".join(
                    "1" if int(s) * 64 > total else "0" for s in cells
                )
                out.append({"doc_id": int(doc_id), "phash": bits})
            yield pd.DataFrame(out, columns=[f.name for f in PHASH_SCHEMA.fields])

    return (
        p.mapInPandas(phash, schema=PHASH_SCHEMA)
        .groupBy("phash")
        .agg(
            F.count("*").alias("n_docs"),
            (F.count("*") - F.lit(1)).cast("long").alias("n_redundant"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
