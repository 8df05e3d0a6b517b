"""Round-6 batch 25: bounded k-core peeling and MOSS-style winnowing
fingerprints.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.wordhash import (
    SQL_WORD_HASHES,
    WORDHASH_MOD,
    word_hashes,
)
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# graph_kcore_peel — who survives iterated minimum-degree pruning?
# --------------------------------------------------------------------------

_KCORE_K = 10
_KCORE_ROUNDS = 3


def _kcore_round_sql(src: str, k: int) -> str:
    """One peel: keep edges whose BOTH endpoints have degree ≥ k."""
    return f"""
    SELECT {src}.ck, {src}.sk FROM {src}
    JOIN (SELECT ck FROM {src} GROUP BY ck HAVING COUNT(*) >= {k}) kc
      USING (ck)
    JOIN (SELECT sk FROM {src} GROUP BY sk HAVING COUNT(*) >= {k}) ks
      USING (sk)
    """


@register(
    "graph_kcore_peel",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    e1 AS ({_kcore_round_sql("e0", _KCORE_K)}),
    e2 AS ({_kcore_round_sql("e1", _KCORE_K)}),
    e3 AS ({_kcore_round_sql("e2", _KCORE_K)})
    SELECT 'customer' AS kind, ck AS key,
           CAST(COUNT(*) AS BIGINT) AS degree
    FROM e3 GROUP BY 1, 2
    UNION ALL
    SELECT 'supplier' AS kind, sk AS key,
           CAST(COUNT(*) AS BIGINT) AS degree
    FROM e3 GROUP BY 1, 2
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (k = 10, 3 unrolled rounds) of the
    customer–supplier trading graph: iteratively drop every node with
    fewer than k distinct trading partners, recompute degrees, repeat —
    the classic core-decomposition loop that isolates the densely
    connected trading core (spam/fraud rings, power-user communities)
    from the thin periphery.  ``graph_degree_distribution`` reads raw
    degrees; the k-core is what's left after degree pruning CASCADES.

    Each round is the standard distributed peel: two map-combined
    degree aggregates on the current edge set + two semi-join filters
    keyed on the node ids — no collect, no broadcast of node sets, so
    the same plan runs on a billion-edge graph.  Rounds are bounded
    (3) to keep the lazy plan shallow and the oracle expressible as
    unrolled CTEs (the ``graph_pagerank_trade`` convention); a
    production loop iterates to fixpoint with a checkpoint every ~5
    rounds, exactly like ``dedup_connected_components``.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    for _ in range(_KCORE_ROUNDS):
        e = cached(e)
        ck_keep = (
            e.groupBy("ck").agg(F.count("*").alias("d")).filter(F.col("d") >= _KCORE_K)
        )
        sk_keep = (
            e.groupBy("sk").agg(F.count("*").alias("d")).filter(F.col("d") >= _KCORE_K)
        )
        e = e.join(ck_keep.select("ck"), "ck", "left_semi").join(
            sk_keep.select("sk"), "sk", "left_semi"
        )
    e = cached(e)
    return (
        e.groupBy("ck")
        .agg(F.count("*").alias("degree"))
        .select(F.lit("customer").alias("kind"), F.col("ck").alias("key"), "degree")
        .unionAll(
            e.groupBy("sk")
            .agg(F.count("*").alias("degree"))
            .select(
                F.lit("supplier").alias("kind"), F.col("sk").alias("key"), "degree"
            )
        )
    )


# --------------------------------------------------------------------------
# text_winnowing_fingerprint — MOSS local fingerprinting
# --------------------------------------------------------------------------

_WINNOW_P = WORDHASH_MOD  # same fold as text_fingerprint (functions/wordhash)


def _shift_zip4(arr: Column) -> Column:
    """Zip ``arr`` with its 1/2/3-shifted selves, trimmed to full
    4-tuples — the zipped-slice shape (HOF lambdas downstream touch
    only their struct element, never an outer array reference)."""
    n = F.size(arr)
    full = F.greatest(n - 3, F.lit(0))
    return F.slice(
        F.arrays_zip(
            arr.alias("a"),
            F.slice(arr, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
            F.slice(arr, 3, F.greatest(n - 2, F.lit(0))).alias("c"),
            F.slice(arr, 4, F.greatest(n - 3, F.lit(0))).alias("d"),
        ),
        1,
        full,
    )


@register(
    "text_winnowing_fingerprint",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    h AS (
      SELECT doc_id,
             {SQL_WORD_HASHES} AS wh
      FROM w
    ),
    kg AS (
      SELECT doc_id,
             [((((wh[i] * 33 + wh[i+1]) % {_WINNOW_P}) * 33 + wh[i+2])
                % {_WINNOW_P} * 33 + wh[i+3]) % {_WINNOW_P}
              for i in range(1, len(wh) - 2)] AS kg
      FROM h
    ),
    fp AS (
      SELECT doc_id, len(kg) AS n_kgrams,
             list_distinct(
               [least(kg[j], kg[j+1], kg[j+2], kg[j+3])
                for j in range(1, len(kg) - 2)]) AS fps
      FROM kg
    ),
    ex AS (SELECT doc_id, unnest(fps) AS f FROM fp),
    shared AS (SELECT f FROM ex GROUP BY f HAVING COUNT(*) >= 2),
    sc AS (
      SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM ex JOIN shared USING (f) GROUP BY 1
    )
    SELECT fp.doc_id,
           CAST(fp.n_kgrams AS BIGINT) AS n_kgrams,
           CAST(len(fp.fps) AS BIGINT) AS n_fingerprints,
           COALESCE(sc.n_shared, 0) AS n_shared
    FROM fp LEFT JOIN sc ON sc.doc_id = fp.doc_id
    """,
)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every word 4-gram (base-33 fold of the
    ``text_fingerprint`` word hashes, mod 1e9+7), slide a window of 4
    consecutive k-gram hashes, keep each window's MINIMUM — a
    position-robust fingerprint set that is guaranteed to detect any
    shared run of ≥ 7 words, at a fraction of ``dedup_exact_substring``'s
    every-window cost.  Per doc: k-gram count, distinct fingerprints
    selected, and how many of them also occur in ANOTHER document (the
    plagiarism / near-dup signal).

    Everything per-row is expression-level HOF work in the
    zipped-slice shape (k-gram hashing AND window minima — lambdas
    touch only their zipped element); the only shuffles carry
    (doc_id, 64-bit fingerprint) pairs.  All-integer hashes: exact on
    both engines.  Scale: fingerprint density is 2/(w+1) ≈ 40 % of
    k-grams before dedup, so the exploded index is a bounded fraction
    of the token stream — the standard winnowing guarantee.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    wh = word_hashes(words)  # shared base-31 fold (functions/wordhash)
    kg = F.transform(
        _shift_zip4(F.col("wh")),
        lambda s: (
            ((s.a * 33 + s.b) % _WINNOW_P * 33 + s.c) % _WINNOW_P * 33 + s.d
        )
        % _WINNOW_P,
    )
    fps = F.array_distinct(
        F.transform(_shift_zip4(F.col("kg")), lambda s: F.least(s.a, s.b, s.c, s.d))
    )
    per_doc = cached(
        d.select("doc_id", wh.alias("wh"))
        .select("doc_id", kg.alias("kg"))
        .select(
            "doc_id",
            F.size("kg").cast("long").alias("n_kgrams"),
            fps.alias("fps"),
        )
    )
    ex = per_doc.select("doc_id", F.explode("fps").alias("f"))
    shared = ex.groupBy("f").agg(F.count("*").alias("nd")).filter(F.col("nd") >= 2)
    sc = (
        ex.join(shared.select("f"), "f")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        per_doc.join(sc, "doc_id", "left")
        .select(
            "doc_id",
            "n_kgrams",
            F.size("fps").cast("long").alias("n_fingerprints"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
        )
    )
