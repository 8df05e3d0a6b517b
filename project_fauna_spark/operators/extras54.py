"""Round-9 seating: never-graded queries relocated from modules whose
other entries are all driver-green.

``stream_dedup_suppress_repeats`` (from streaming_batch, whose four
windowed-aggregation analogs were graded green in r3) and
``scalar_higher_order_fns`` (from udf_surface, graded r3) were the
only two never-graded entries interleaved among graded siblings — the
round-9 window can only be the 49-name never-graded backlog if those
two register contiguously with it, so they live here until graded
(the window_regrade.py convention from round 4, in reverse; after
their grade they move home like the round-7/8 moved-home seats).

Registered after extras53 so the round-8 first-50 window is untouched
(pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import SQL_TS_OUT, TS_OUT
from project_fauna_spark.plans.registry import register


@register(
    "stream_dedup_suppress_repeats",
    oracle=f"""
    WITH marked AS (
      SELECT event_id, user_id, event_type, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                  THEN 1 ELSE 0 END AS new_burst
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    bursts AS (
      SELECT *,
             SUM(new_burst) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS burst_no
      FROM marked
    )
    SELECT user_id, event_type,
           strftime(MIN(ts), '{SQL_TS_OUT}') AS first_ts,
           MIN(event_id) AS kept_event_id,
           COUNT(*) - 1 AS n_suppressed
    FROM bursts GROUP BY user_id, event_type, burst_no
    """,
)
def stream_dedup_suppress_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-dedup analog: suppress repeats of the same
    (user, event_type) arriving within 10 minutes of the previous
    occurrence — keep the first event of each burst, count the
    suppressed copies.  This is the batch rendering of
    ``dropDuplicatesWithinWatermark`` semantics (the real streaming
    twin, :func:`project_fauna_spark.streaming.pipelines.dedup_stream`,
    bounds its state by the watermark exactly as this bounds bursts by
    the gap; smoke-tested in tests/test_streaming.py).

    One shuffle on the dedup key; per-key window state is a single
    lag + running sum — the same bounded-state layout the streaming
    state store keeps.  event_id tie-break on every window (repo
    invariant: equal-ts rows fold identically in both engines).
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_burst",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 600_000_000), 1).otherwise(0),
    )
    w2 = (
        W.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bursts = marked.withColumn("burst_no", F.sum("new_burst").over(w2))
    return bursts.groupBy("user_id", "event_type", "burst_no").agg(
        F.date_format(F.min("ts"), TS_OUT).alias("first_ts"),
        F.min("event_id").alias("kept_event_id"),
        (F.count("*") - 1).alias("n_suppressed"),
    ).drop("burst_no")


@register(
    "scalar_higher_order_fns",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           coalesce(array_to_string(list_transform(words[1:5], x -> upper(x)), '|'),
                    '') AS first5_upper,
           coalesce(array_to_string(list_filter(words[1:20], x -> length(x) > 4), '|'),
                    '') AS long_words_20,
           len(list_filter(words, x -> x = 'data')) AS n_data,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(words, x -> CAST(length(x) AS BIGINT))),
                       (a, b) -> a + b) AS total_chars,
           list_has_any(words, ['spark', 'query']) AS mentions_engine,
           list_has_all(words[1:50], ['the']) AS has_the_early
    FROM w
    """,
)
def scalar_higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order function battery: transform, filter, aggregate
    (fold), exists/forall-style predicates — all JVM-side lambdas."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(words, 1, 5), lambda x: F.upper(x)), "|"
        ).alias("first5_upper"),
        F.array_join(
            F.filter(F.slice(words, 1, 20), lambda x: F.length(x) > 4), "|"
        ).alias("long_words_20"),
        F.size(F.filter(words, lambda x: x == F.lit("data"))).cast("long").alias("n_data"),
        F.aggregate(
            F.transform(words, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.exists(words, lambda x: (x == F.lit("spark")) | (x == F.lit("query"))).alias(
            "mentions_engine"
        ),
        F.forall(
            F.array(F.lit("the")), lambda t: F.array_contains(F.slice(words, 1, 50), t)
        ).alias("has_the_early"),
    )
