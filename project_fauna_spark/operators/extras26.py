"""Round-6 batch 20: a Markov next-event baseline with a leakage-safe
time split, and a customer spend-band migration matrix.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ml_markov_next_event_eval — how predictable is the event stream?
# --------------------------------------------------------------------------


@register(
    "ml_markov_next_event_eval",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
    ),
    pairs AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER w AS nxt,
             LEAD(us) OVER w AS nxt_us
      FROM ordered
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sp AS (
      SELECT (MIN(us) + (MAX(us) - MIN(us)) // 2) AS split_us FROM ordered
    ),
    train AS (
      SELECT cur, nxt, COUNT(*) AS cnt
      FROM pairs CROSS JOIN sp
      WHERE nxt IS NOT NULL AND nxt_us < split_us
      GROUP BY cur, nxt
    ),
    model AS (
      SELECT cur, MAX(struct_pack(c := cnt, t := nxt)).t AS predicted
      FROM train GROUP BY cur
    ),
    test AS (
      SELECT p.cur, p.nxt, m.predicted
      FROM pairs p CROSS JOIN sp LEFT JOIN model m ON m.cur = p.cur
      WHERE p.nxt IS NOT NULL AND p.nxt_us >= sp.split_us
    )
    SELECT cur AS event_type,
           MAX(predicted) AS predicted_next,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(COUNT(CASE WHEN nxt = predicted THEN 1 END) AS BIGINT)
             AS n_correct,
           CAST(COUNT(CASE WHEN nxt = predicted THEN 1 END) AS DOUBLE)
             / COUNT(*) AS accuracy
    FROM test GROUP BY cur
    """,
)
def ml_markov_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtested first-order Markov next-event baseline: train
    "predict the most frequent successor of each event type" on the
    FIRST half of the timeline, score top-1 accuracy per type on the
    SECOND half — the floor any sequence model must beat, evaluated
    with the same point-in-time discipline ``ml_leakage_naive_vs_asof``
    audits (a random split would leak future behavior into training).
    ``event_type_transitions`` gives the transition matrix; this turns
    it into a scored predictor.

    Successor pairs come from a per-user LEAD window ordered by the
    unique (µs, event_id) key — deterministic under timestamp ties,
    bounded per-partition on the high-cardinality user key.  The time
    split is the exact integer-µs midpoint (broadcast 1-row).  The
    argmax breaks count ties to the lexicographically largest type via
    a (count, type) struct max in both engines.  Counts are exact; the
    accuracy is one integer division.  Unseen-in-train types predict
    NULL and score as wrong — the honest denominator.  Scale: one
    user-keyed window + two tiny keyed aggregates over the handful of
    event types.
    """
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    ordered = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
    )
    pairs = cached(
        ordered.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
            F.lead("us").over(w).alias("nxt_us"),
        ).filter(F.col("nxt").isNotNull())
    )
    sp = ordered.agg(
        F.expr("min(us) + (max(us) - min(us)) div 2").alias("split_us")
    )
    train = (
        pairs.crossJoin(F.broadcast(sp))
        .filter(F.col("nxt_us") < F.col("split_us"))
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("cnt"))
    )
    model = train.groupBy("cur").agg(
        F.max(
            F.struct(F.col("cnt").alias("c"), F.col("nxt").alias("t"))
        ).getField("t").alias("predicted")
    )
    test = (
        pairs.crossJoin(F.broadcast(sp))
        .filter(F.col("nxt_us") >= F.col("split_us"))
        .join(F.broadcast(model), "cur", "left")
    )
    correct = F.when(F.col("nxt") == F.col("predicted"), 1)
    return test.groupBy(F.col("cur").alias("event_type")).agg(
        F.max("predicted").alias("predicted_next"),
        F.count("*").cast("long").alias("n_test"),
        F.count(correct).cast("long").alias("n_correct"),
        (F.count(correct).cast("double") / F.count("*")).alias("accuracy"),
    )


# --------------------------------------------------------------------------
# q_value_band_migration — year-over-year customer value transitions
# --------------------------------------------------------------------------

_BAND = """CASE WHEN {s} < 300000 THEN 'low'
                WHEN {s} < 600000 THEN 'mid'
                ELSE 'high' END"""


@register(
    "q_value_band_migration",
    oracle=f"""
    WITH cy AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(30,8)))
               AS spend
      FROM orders GROUP BY 1, 2
    ),
    banded AS (
      SELECT o_custkey, yr, {_BAND.format(s='spend')} AS band FROM cy
    ),
    moves AS (
      SELECT a.band AS band_from, b.band AS band_to
      FROM banded a JOIN banded b
        ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM moves)
    SELECT band_from, band_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS DOUBLE) / MAX(tot.n) AS share
    FROM moves CROSS JOIN tot
    GROUP BY band_from, band_to
    """,
)
def q_value_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value migration matrix: each customer's annual spend
    is banded low/mid/high (fixed thresholds), and consecutive-year
    (band_from → band_to) transitions are counted — the CRM churn/
    upgrade flow report ("how many high-value customers slipped to
    mid?") that ``event_rfm_segmentation`` snapshots cannot show
    because it has no time axis.

    Annual spend accumulates in exact decimal (VARCHAR-routed into
    DuckDB), so band assignment compares exact decimals against
    integer literals — no float boundary ambiguity.  The year-over-
    year self-join keys on (custkey, yr+1): customer-keyed, never
    all-pairs.  Counts are exact; the share is one integer division
    against a broadcast total.  Scale: one (custkey, year) aggregate,
    one co-keyed self-join, a 9-cell rollup.
    """
    cy = cached(
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias("spend")
        )
        .select("o_custkey", "yr", F.expr(_BAND.format(s="spend")).alias("band"))
    )
    a = cy.select(
        F.col("o_custkey").alias("ck"),
        F.col("yr").alias("y"),
        F.col("band").alias("band_from"),
    )
    b = cy.select(
        F.col("o_custkey").alias("ck"),
        (F.col("yr") - F.lit(1)).alias("y"),
        F.col("band").alias("band_to"),
    )
    moves = cached(a.join(b, ["ck", "y"]).select("band_from", "band_to"))
    tot = moves.agg(F.count("*").alias("n"))
    return (
        moves.crossJoin(F.broadcast(tot))
        .groupBy("band_from", "band_to")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            (F.count("*").cast("double") / F.max("n")).alias("share"),
        )
    )
