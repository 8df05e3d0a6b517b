"""Round-6 batch 35: PCM-style signal features over byte samples and
the GROUPED_AGG pandas-UDF surface.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql.functions import pandas_udf

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# mm_signal_features — DSP features without a DSP library
# --------------------------------------------------------------------------


@register(
    "mm_signal_features",
    # Bytes are ASCII (the mm convention: length == octet_length filter
    # on BOTH sides), so unicode(char) == byte value and both engines
    # see the same integer sample stream.  Centering is exact: the
    # deviation n·b − S is an integer (cross-multiplied mean), so
    # energy and crossing signs never touch floats.
    oracle="""
    WITH s AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents
      WHERE octet_length(encode(text)) = length(text) AND length(text) > 0
    ),
    b AS (
      SELECT s.doc_id, s.n, g.i,
             CAST(unicode(substring(s.text, CAST(g.i AS INT), 1)) AS BIGINT)
               AS v
      FROM s, LATERAL (SELECT unnest(range(1, s.n + 1)) AS i) g
    ),
    t AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sv FROM b GROUP BY 1),
    d AS (
      SELECT b.doc_id, b.i, b.n * b.v - t.sv AS dev,
             LAG(b.n * b.v - t.sv) OVER (PARTITION BY b.doc_id ORDER BY b.i)
               AS prev_dev
      FROM b JOIN t USING (doc_id)
    )
    SELECT doc_id,
           CAST(MAX(i) AS BIGINT) AS n_samples,
           CAST(SUM(CAST(dev * dev AS HUGEINT)) AS BIGINT)
             AS energy_scaled,
           CAST(SUM(CASE WHEN prev_dev IS NOT NULL
                          AND dev * prev_dev < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings,
           CAST(MAX(ABS(dev)) AS BIGINT) AS peak_dev_scaled
    FROM d GROUP BY doc_id
    """,
)
def mm_signal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-processing features over the payload treated as 8-bit
    PCM samples: per document, the mean-centered ENERGY, the
    ZERO-CROSSING count (sign flips around the mean — the classic
    cheap voiced/unvoiced & noisiness feature), and the peak
    deviation.  The audio-feature-extraction plumbing of the
    multimodal column family (``mm_decode_features`` is the image
    side), with stdlib-only math: swap the byte stream for real PCM
    and ONLY the source column changes.

    Exactness by cross-multiplication: centering on the mean uses the
    integer deviation n·b − S (never the fractional mean), so energy,
    crossings, and peak are all integer arithmetic — energy
    accumulates in decimal(38,0)/HUGEINT and exits as BIGINT.  Scale:
    samples EXPLODE to rows (doc-keyed — the honest distributed-DSP
    shape: a billion-sample stream partitions by doc/channel), one
    per-doc total join, one doc-keyed LAG, one aggregate.
    """
    d0 = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.length("text") == F.octet_length("text")) & (F.length("text") > 0)
        )
        .select("doc_id", F.length("text").alias("n"), "text")
    )
    b = cached(
        d0.select(
            "doc_id",
            "n",
            F.posexplode(F.split("text", "")).alias("i0", "ch"),
        ).select(
            "doc_id",
            "n",
            (F.col("i0") + 1).alias("i"),
            F.ascii("ch").cast("long").alias("v"),
        )
    )
    t = b.groupBy("doc_id").agg(F.sum("v").alias("sv"))
    dev = (F.col("n") * F.col("v") - F.col("sv")).alias("dev")
    dd = (
        b.join(t, "doc_id")
        .select("doc_id", "i", dev)
        .select(
            "doc_id",
            "i",
            "dev",
            F.lag("dev").over(W.partitionBy("doc_id").orderBy("i")).alias(
                "prev_dev"
            ),
        )
    )
    return dd.groupBy("doc_id").agg(
        F.max("i").cast("long").alias("n_samples"),
        F.sum((F.col("dev") * F.col("dev")).cast("decimal(38,0)"))
        .cast("long")
        .alias("energy_scaled"),
        F.sum(
            F.when(
                F.col("prev_dev").isNotNull()
                & (F.col("dev") * F.col("prev_dev") < 0),
                1,
            ).otherwise(0)
        ).alias("zero_crossings"),
        F.max(F.abs(F.col("dev"))).cast("long").alias("peak_dev_scaled"),
    )


# --------------------------------------------------------------------------
# udf_grouped_agg_median — the vectorized GROUPED_AGG UDF surface
# --------------------------------------------------------------------------


@register(
    "udf_grouped_agg_median",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type ORDER BY event_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(CASE WHEN rn * 2 = n OR rn * 2 = n + 1
                         THEN event_id END) AS BIGINT) AS median_event_id
    FROM r GROUP BY event_type
    """,
)
def udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOWER-median event id per type via a GROUPED_AGG pandas UDF —
    the fourth and last vectorized-UDF execution mode (scalar,
    grouped-map, cogrouped-map, map-iterator are covered by the other
    ``udf_*`` queries; this one is an Arrow-batched AGGREGATE whose
    partial state is the whole group, used directly inside
    ``groupBy().agg()``).

    The UDF computes the order-statistic exactly (numpy sort, lower
    middle), so the DuckDB oracle replays it with a rank selection —
    a deliberately deterministic function in a surface that usually
    hosts approximate math.  Scale note: GROUPED_AGG ships each whole
    group through Arrow (no partial aggregation) — the right tool for
    bounded groups (5 types here) and exactly the WRONG tool for
    skewed billions-row groups, which belong in the two-phase
    rank machinery instead (``agg_percentile_exact``); the docstring
    IS the decision rule.
    """

    @pandas_udf("long")
    def lower_median(v: pd.Series) -> int:
        arr = v.sort_values().to_numpy()
        return int(arr[(len(arr) - 1) // 2])

    e = load_table(spark, sf_dir, "events").select("event_type", "event_id")
    # Spark forbids mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the
    # count comes from its own map-combined aggregate, joined back on
    # the tiny type key.
    counts = e.groupBy("event_type").agg(F.count("*").alias("n_events"))
    medians = e.groupBy("event_type").agg(
        lower_median("event_id").alias("median_event_id")
    )
    # eqNullSafe: a regenerated corpus with NULL event_type must keep
    # the NULL-keyed group like the oracle's GROUP BY does.
    m2 = medians.withColumnRenamed("event_type", "et")
    return counts.join(m2, counts.event_type.eqNullSafe(m2.et)).select(
        "event_type", "n_events", "median_event_id"
    )
