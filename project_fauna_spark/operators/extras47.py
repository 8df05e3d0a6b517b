"""Round-6 batch 41: one-pass numeric correlation matrix and
embedding-centroid drift.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.functions.centroids import (
    label_centroids,
    sql_centroid_ctes,
)
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_COS
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# dq_numeric_corr_matrix — the profiler's correlation matrix, one pass
# --------------------------------------------------------------------------

_CORR_COLS = ["qty", "price_c", "disc_bp", "tax_bp"]
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_matrix_oracle() -> str:
    sums = ", ".join(
        [f"CAST(COUNT(*) AS HUGEINT) AS np"]
        + [f"SUM(CAST({c} AS HUGEINT)) AS s_{c}" for c in _CORR_COLS]
        + [
            f"SUM(CAST({a} AS HUGEINT) * {b}) AS s_{a}_{b}"
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i:]
        ]
    )
    def corr(a: str, b: str) -> str:
        num = f"np * s_{a}_{b} - s_{a} * s_{b}"
        dx = f"np * s_{a}_{a} - s_{a} * s_{a}"
        dy = f"np * s_{b}_{b} - s_{b} * s_{b}"
        return f"""
        SELECT '{a}' AS col_a, '{b}' AS col_b,
               CASE WHEN {dx} > 0 AND {dy} > 0
                    THEN CAST(CAST({num} AS VARCHAR) AS DOUBLE)
                      / (sqrt(CAST(CAST({dx} AS VARCHAR) AS DOUBLE))
                         * sqrt(CAST(CAST({dy} AS VARCHAR) AS DOUBLE)))
               END AS corr
        FROM m"""

    body = " UNION ALL ".join(corr(a, b) for a, b in _CORR_PAIRS)
    return f"""
    WITH t AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_bp,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_bp
      FROM lineitem
    ),
    m AS (SELECT {sums} FROM t)
    {body}
    """


@register("dq_numeric_corr_matrix", oracle_builder=_corr_matrix_oracle)
def dq_numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of lineitem's four numeric
    measures (quantity, price cents, discount bp, tax bp) — the
    profiler artifact that flags redundant features and derived
    columns before any model sees them
    (``agg_corr_deterministic`` scores ONE pair; this is all six from
    ONE scan: the 15 exact moment accumulators share a single
    map-combined aggregate, which is the point at 100 TB — the cost
    of the full matrix equals the cost of one correlation).

    Measures are exact integers (same ROUND-on-identical-doubles
    bucketing as ``q_discount_demand_curve``), moments accumulate in
    decimal(38,0)/HUGEINT, and each correlation is one division plus
    two IEEE sqrts of identical integers (VARCHAR-routed edges — the
    products here exceed 2^53, where the routing genuinely matters).
    """
    t = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_bp"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_bp"),
    )
    d = {c: F.col(c).cast("decimal(19,0)") for c in _CORR_COLS}
    aggs = (
        [F.count("*").alias("np_l")]
        + [F.sum(d[c]).alias(f"s_{c}") for c in _CORR_COLS]
        + [
            F.sum(d[a] * d[b]).alias(f"s_{a}_{b}")
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i:]
        ]
    )
    m = cached(t.agg(*aggs))
    np_d = F.col("np_l").cast("decimal(38,0)")

    def corr_row(a: str, b: str) -> DataFrame:
        num = np_d * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        dx = np_d * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        dy = np_d * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        corr = num.cast("double") / (
            F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))
        )
        return m.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.when((dx > 0) & (dy > 0), corr).alias("corr"),
        )

    return reduce(
        DataFrame.unionAll, [corr_row(a, b) for a, b in _CORR_PAIRS]
    )


# --------------------------------------------------------------------------
# sim_centroid_drift_halves — did the embedding distribution move?
# --------------------------------------------------------------------------

_FOLD_K = 256  # the sim_label_centroid two-level fold width


@register(
    "sim_centroid_drift_halves",
    oracle=f"""
    WITH {sql_centroid_ctes(_FOLD_K, where="WHERE vec_id % 2 = 0", tag="a")},
    {sql_centroid_ctes(_FOLD_K, where="WHERE vec_id % 2 = 1", tag="b")}
    SELECT a.label, a.n AS n_even, b.n AS n_odd,
           {SQL_COS.format(a='a.centroid', b='b.centroid')} AS drift_cos
    FROM cent_a a JOIN cent_b b USING (label)
    """,
)
def sim_centroid_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift check: split each label's vectors
    into two halves (even / odd vec_id — the deterministic stand-in
    for "yesterday's batch vs today's"), compute both halves'
    centroids with the shared two-level fixed-order fold, and report
    their cosine — ≈1 means the distribution is stable, a drop is the
    re-index/re-train alarm (``sim_centroid_confusion`` compares
    centroids ACROSS labels; this compares each label WITH ITSELF
    across batches).

    Both centroids use the ``functions/centroids`` machinery
    (bounded two-level fold, bit-equal to the oracle's list_reduce
    replay); the drift cosine is the index-ordered fold over two
    identical double arrays.  Scale: two filtered passes that
    map-combine; state per label is one embedding-width vector per
    fold bucket.
    """
    e = cached(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", "embedding"
        )
    )
    from project_fauna_spark.functions.vectors import cosine_sim

    a = label_centroids(e.filter(F.col("vec_id") % 2 == 0), _FOLD_K).select(
        "label", F.col("n").alias("n_even"), F.col("centroid").alias("c_a")
    )
    b = label_centroids(e.filter(F.col("vec_id") % 2 == 1), _FOLD_K).select(
        "label", F.col("n").alias("n_odd"), F.col("centroid").alias("c_b")
    )
    return a.join(b, "label").select(
        "label",
        "n_even",
        "n_odd",
        cosine_sim(F.col("c_a"), F.col("c_b")).alias("drift_cos"),
    )
