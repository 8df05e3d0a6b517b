"""Time-series resampling operators over the ``events`` table.

The downsampling shapes a metrics/market pipeline runs: OHLC-style
bucket summaries (open/high/low/close per time bucket) and bucketed
rate-of-events.  Companion to ``llm_pipeline.llm_gap_fill_forward``
(upsampling/ffill) — together they cover both resampling directions.

Scale design (100 TB):

* One map-combined aggregate per query: open/close are struct-ordered
  MIN/MAX (the registry's argmax convention — (ts, event_id, value)
  struct min is exactly "value at earliest tie-broken timestamp"),
  which combines associatively on partials, so no window pass and no
  per-group buffering of events.
* The bucket key (event_type × hour) is the shuffle key; bucket count
  grows with time range, not data volume — no skew at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register


@register(
    "ts_ohlc_downsample",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           (min({'ts': ts, 'eid': event_id, 'v': value})).v AS open,
           max(value) AS high,
           min(value) AS low,
           (max({'ts': ts, 'eid': event_id, 'v': value})).v AS close,
           count(*) AS n
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY 1, 2
    """,
)
def ts_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsample: per (event_type, hour) — first/max/min/last of
    ``value``, with first/last tie-broken by the unique event_id.

    Open/close are struct-min/max aggregates ((ts, event_id, value)
    compares lexicographically in both engines), NOT window functions:
    the aggregate combines associatively across partitions, so the
    plan is one partial+final hash agg — no sort, no per-group state
    beyond the four running extremes."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    key = F.struct(F.col("ts"), F.col("event_id").alias("eid"), F.col("value").alias("v"))
    return (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        )
        .agg(
            F.min(key).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key).getField("v").alias("close"),
            F.count("*").alias("n"),
        )
    )


@register(
    "ts_ewma_bounded",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS value,
             list_reverse(list(CAST(value AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)) AS rev
      FROM events
    )
    SELECT user_id, ts, event_id, value,
           list_reduce([rev[i] * (1.0 / CAST(1 << (i - 1) AS DOUBLE))
                        for i in range(1, len(rev) + 1)],
                       (a, x) -> a + x)
           / (2.0 - 1.0 / CAST(1 << (len(rev) - 1) AS DOUBLE)) AS ewma
    FROM w
    """,
)
def ts_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) over the last
    16 events per user — the streaming-metrics smoother, made
    cross-engine bit-exact.

    Determinism argument: the weights are powers of two, so every
    product ``x·2⁻ᵏ`` is EXACT (exponent shift, no rounding); the
    only rounding is the numerator sum, folded in fixed index order
    (newest→oldest) on both engines (``F.aggregate`` here,
    ``list_reduce`` in DuckDB).  The normalizer ``Σ 2⁻ᵏ = 2 − 2⁻⁽ⁿ⁻¹⁾``
    is a closed form, exact in binary.

    Scale: one exchange on user_id + sort; frame state is bounded at
    16 rows, so window memory is O(1) per row at any corpus size.
    """
    from pyspark.sql import Window as W

    weights = F.array(*[F.lit(1.0 / (1 << k)) for k in range(16)])
    wspec = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-15, 0)
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("value")
    )
    rev = F.reverse(F.collect_list("value").over(wspec))
    x = e.withColumn("rev", rev)
    num = F.aggregate(
        F.zip_with(F.col("rev"), F.slice(weights, 1, F.size("rev")), lambda x_, w_: x_ * w_),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    den = F.lit(2.0) - F.element_at(weights, F.size("rev"))
    return x.select("user_id", "ts", "event_id", "value", (num / den).alias("ewma"))
