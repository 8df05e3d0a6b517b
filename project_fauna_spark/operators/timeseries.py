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
from pyspark.sql.window import Window

from project_fauna_spark.cache import cached
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


@register(
    "window_moving_corr",
    oracle="""
    WITH sc AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
             CAST(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(12,2)) * 100 AS BIGINT) AS xl,
             CAST(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(12,2)) * 100 AS BIGINT) AS yl
      FROM lineitem
    ),
    m AS (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             COUNT(*) OVER w AS n,
             SUM(xl) OVER w AS sx,
             SUM(yl) OVER w AS sy,
             SUM(xl * yl) OVER w AS sxy,
             SUM(xl * xl) OVER w AS sxx,
             SUM(yl * yl) OVER w AS syy
      FROM sc
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber, xl, yl
                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
    ),
    d AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, n,
             CAST(sx AS DOUBLE) AS dx,
             CAST(sy AS DOUBLE) AS dy,
             CAST(sxy AS DOUBLE) AS dxy,
             CAST(sxx AS DOUBLE) AS dxx,
             CAST(syy AS DOUBLE) AS dyy
      FROM m
    )
    SELECT l_suppkey, l_orderkey, l_linenumber, n,
           CASE WHEN n >= 2 AND n * dxx - dx * dx > 0 AND n * dyy - dy * dy > 0
                THEN (n * dxy - dx * dy)
                     / (sqrt(n * dxx - dx * dx) * sqrt(n * dyy - dy * dy))
           END AS corr16
    FROM d
    """,
)
def window_moving_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation (16-row frame) of quantity vs price
    per supplier — the moving-analytics shape (rolling beta, rolling
    hedge ratios) done deterministically.

    Correlation is scale-invariant, and both inputs are exactly
    2-decimal — so the moments accumulate over ×100-scaled LONGs:
    exact integer arithmetic (codegen-friendly primitives instead of
    int128 decimals), every frame sum < 2⁵³ (converts to double
    exactly); only the final per-row combination rounds
    — the same argument as ``analytics.agg_corr_deterministic``,
    lifted to windows.  Degenerate frames (n=1, constant values, or a
    variance rounded to ≤0) gate to NULL on both engines — ANSI Spark
    throws on double division by zero, so the guard is explicit.

    Tie-break: the synthetic lineitem has NO unique key — even
    (l_orderkey, l_linenumber, l_suppkey) collides (~175 dups at
    sf0.1), and a frame boundary between value-distinct tied rows is
    engine-order-dependent (2 divergent rows out of 600k at sf0.1
    before the fix).  Appending (xl, yl) to the ORDER BY makes any
    remaining ties value-identical, so every frame is multiset-equal
    under either order and the output is deterministic on both
    engines.

    Scale: one exchange on l_suppkey; frame state is 16 rows."""
    from pyspark.sql import Window as W

    l = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "xl", "yl")
        .rowsBetween(-15, 0)
    )
    xl = (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("long")
    yl = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
    sc = l.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
        xl.alias("xl"), yl.alias("yl"),
    )
    m = sc.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("xl").over(w).cast("double").alias("dx"),
        F.sum("yl").over(w).cast("double").alias("dy"),
        F.sum(F.col("xl") * F.col("yl")).over(w).cast("double").alias("dxy"),
        F.sum(F.col("xl") * F.col("xl")).over(w).cast("double").alias("dxx"),
        F.sum(F.col("yl") * F.col("yl")).over(w).cast("double").alias("dyy"),
    )
    n, dx, dy = F.col("n"), F.col("dx"), F.col("dy")
    dxy, dxx, dyy = F.col("dxy"), F.col("dxx"), F.col("dyy")
    vx, vy = n * dxx - dx * dx, n * dyy - dy * dy
    # ANSI mode: double division by zero THROWS (not IEEE NaN), so
    # degenerate frames (n=1, constant values, or a variance rounded
    # to <= 0) gate to NULL — same CASE on both engines.
    corr = F.when(
        (n >= 2) & (vx > 0) & (vy > 0),
        (n * dxy - dx * dy) / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return m.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "n", corr.alias("corr16")
    )


# --------------------------------------------------------------------------
# ts_max_drawdown — worst peak-to-trough collapse of the daily series
# --------------------------------------------------------------------------


@register(
    "ts_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day,
             MAX(cnt) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) - cnt AS dd
      FROM daily
    ),
    m AS (
      SELECT event_type, CAST(MAX(dd) AS BIGINT) AS max_drawdown,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM w GROUP BY 1
    )
    SELECT m.event_type, m.n_days, m.max_drawdown,
           MIN(w.day) AS trough_day
    FROM m JOIN w ON w.event_type = m.event_type AND w.dd = m.max_drawdown
    GROUP BY 1, 2, 3
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily event count per type: the largest
    gap between the running historical peak and the current day's
    volume, plus the (earliest) day it bottomed out — the
    peak-to-trough collapse metric finance applies to equity curves
    and ops dashboards apply to traffic ("how far below our best day
    did we ever fall, and when?").  ``ts_cusum_changepoint`` locates
    sustained level SHIFTS; drawdown measures worst-case regression
    from the peak — 0 for a series that only ever sets new highs.

    All-integer: running max of exact counts, drawdown = runmax − cnt,
    the trough is the min day achieving the max (join-back, no
    order-dependent argmax).  Scale: the window and join-back run on
    the calendar-bounded daily frame (days × types), after one
    map-combined aggregate over raw events — a per-key unbounded
    series would two-phase through ``functions/ranks.bucket_offsets``
    instead.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = cached(
        daily.select(
            "event_type",
            "day",
            (F.max("cnt").over(run) - F.col("cnt")).alias("dd"),
        )
    )
    m = w.groupBy("event_type").agg(
        F.max("dd").cast("long").alias("max_drawdown"),
        F.count("*").alias("n_days"),
    )
    # m derives from w, so disambiguate the join keys by renaming.
    m2 = m.withColumnRenamed("event_type", "et")
    return (
        w.join(
            F.broadcast(m2),
            (F.col("event_type") == F.col("et"))
            & (F.col("dd") == F.col("max_drawdown")),
        )
        .groupBy("et", "n_days", "max_drawdown")
        .agg(F.min("day").alias("trough_day"))
        .select(
            F.col("et").alias("event_type"),
            "n_days",
            "max_drawdown",
            "trough_day",
        )
    )
