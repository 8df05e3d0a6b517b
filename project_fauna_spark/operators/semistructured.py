"""Semi-structured data + advanced aggregate/generator operators.

Maps, structs, null-safe comparison joins, order-statistic and argmax
aggregates, outer/positional explodes — the remaining §2b surface that
real pipelines lean on for nested/JSON-shaped data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register


@register(
    "semi_map_functions",
    oracle="""
    WITH m AS (
      SELECT event_id,
             MAP {'type': event_type, 'k': CAST(json_extract(props, '$.k') AS VARCHAR)} AS attrs
      FROM events
    )
    SELECT event_id,
           CAST(cardinality(attrs) AS INT) AS n_keys,
           attrs['type'][1] AS attr_type,
           CAST(attrs['k'][1] AS BIGINT) AS attr_k,
           list_sort(map_keys(attrs)) AS keys_sorted
    FROM m
    """,
)
def semi_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction, size, lookup, key listing."""
    e = load_table(spark, sf_dir, "events")
    attrs = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return e.select(
        "event_id",
        F.size(attrs).alias("n_keys"),
        attrs["type"].alias("attr_type"),
        attrs["k"].cast("long").alias("attr_k"),
        F.array_sort(F.map_keys(attrs)).alias("keys_sorted"),
    )


@register(
    "semi_struct_nesting",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             {'cust': {'key': o_custkey, 'status': o_orderstatus},
              'year': CAST(year(o_orderdate) AS INT)} AS order_info,
             o_totalprice
      FROM orders
    )
    SELECT o_orderkey,
           to_json(order_info) AS order_info_json,
           order_info.cust.key AS cust_key_out,
           order_info.year AS year_out,
           o_totalprice AS price_out
    FROM s
    """,
)
def semi_struct_nesting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct build, field access, JSON serialization.

    The struct round-trips through ``to_json`` at the compared edge
    (nested values are ints/strings only — compact-JSON doubles
    serialize differently across engines)."""
    o = load_table(spark, sf_dir, "orders")
    info = F.struct(
        F.struct(F.col("o_custkey").alias("key"), F.col("o_orderstatus").alias("status")).alias(
            "cust"
        ),
        F.year("o_orderdate").alias("year"),
    )
    return o.select(
        "o_orderkey",
        F.to_json(info).alias("order_info_json"),
        info["cust"]["key"].alias("cust_key_out"),
        info["year"].alias("year_out"),
        F.col("o_totalprice").alias("price_out"),
    )


@register(
    "semi_null_safe_join",
    oracle="""
    WITH a AS (SELECT event_id, CASE WHEN event_id % 5 = 0 THEN NULL
                                     ELSE CAST(event_id % 7 AS BIGINT) END AS k
               FROM events WHERE event_id < 200),
         b AS (SELECT event_id, CASE WHEN event_id % 3 = 0 THEN NULL
                                     ELSE CAST(event_id % 7 AS BIGINT) END AS k
               FROM events WHERE event_id >= 200 AND event_id < 400)
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.k AS k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def semi_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>``): NULL keys match each other —
    unlike plain equi joins, where NULL never matches."""
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_id") < 200).select(
        F.col("event_id").alias("id_a"),
        F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("event_id") % 7).alias("ka"),
    )
    b = e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 400)).select(
        F.col("event_id").alias("id_b"),
        F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("event_id") % 7).alias("kb"),
    )
    return a.join(b, a.ka.eqNullSafe(b.kb)).select("id_a", "id_b", F.col("ka").alias("k"))


@register(
    "semi_argmax_aggregates",
    oracle="""
    SELECT event_type,
           arg_max(event_id, value) AS max_value_event,
           arg_min(event_id, value) AS min_value_event,
           max(value) AS max_value,
           median(value) AS median_value
    FROM events GROUP BY event_type
    """,
)
def semi_argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax) + exact median.

    value is continuous so argmax ties don't arise; mode() is NOT here
    because tied modes resolve engine-specifically — the deterministic
    mode lives in semi_mode_deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.max_by("event_id", "value").alias("max_value_event"),
        F.min_by("event_id", "value").alias("min_value_event"),
        F.max("value").alias("max_value"),
        F.median("value").alias("median_value"),
    )


@register(
    "semi_mode_deterministic",
    oracle="""
    SELECT event_type, user_id AS mode_user, n FROM (
      SELECT event_type, user_id, COUNT(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY COUNT(*) DESC, user_id) AS rn
      FROM events GROUP BY event_type, user_id
    ) WHERE rn = 1
    """,
)
def semi_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with a deterministic tiebreak (count desc, then key) —
    the reproducible spelling of ``mode()``; built-in mode() breaks
    ties engine-specifically."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy(F.col("n").desc(), "user_id")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("user_id").alias("mode_user"), "n")
    )


@register("semi_percentile_approx")  # sketch-based → rows-only check
def semi_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch) — the scale path for
    quantiles; exact quantiles of 100 TB need a full sort."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("p50_p95_p99")
    )


@register(
    "semi_posexplode_outer",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN NULL
                  ELSE (string_split(text, ' '))[1:3] END AS first3
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, u.pos, u.word FROM (
      SELECT doc_id,
             unnest(CASE WHEN first3 IS NULL OR len(first3) = 0
                         THEN [{'pos': CAST(-1 AS INT), 'word': CAST(NULL AS VARCHAR)}]
                         ELSE list_transform(range(1, len(first3) + 1),
                                             i -> {'pos': CAST(i - 1 AS INT), 'word': first3[i]})
                    END) AS u
      FROM src
    )
    """,
)
def semi_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer: positional explode that keeps NULL-array rows
    (outer) — pos normalized to -1 for the kept empty rows."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    first3 = F.when(
        F.col("doc_id") % 10 == 0, F.lit(None).cast("array<string>")
    ).otherwise(F.slice(F.split(F.col("text"), " "), 1, 3))
    return (
        d.select("doc_id", first3.alias("first3"))
        .select("doc_id", F.posexplode_outer("first3").alias("pos", "word"))
        .select("doc_id", F.coalesce(F.col("pos"), F.lit(-1)).alias("pos"), "word")
    )


@register(
    "semi_collect_sorted",
    oracle="""
    SELECT user_id,
           list(event_type ORDER BY ts, event_id) AS event_seq,
           len(list(event_type ORDER BY ts, event_id)) AS n
    FROM events WHERE user_id < 20 GROUP BY user_id
    """,
)
def semi_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic collect_list: gather (sort-key, value) structs,
    array_sort, project values — the reproducible ordered-collect
    pattern (bare collect_list order is shuffle-dependent)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    seq = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
        ),
        lambda s: s.event_type,
    )
    return e.groupBy("user_id").agg(seq.alias("event_seq"), F.size(seq).alias("n"))
