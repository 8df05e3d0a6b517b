"""Data-quality and reshaping operators.

The validation layer a production pipeline runs before/after loads:
column profiling, referential-integrity checks, FILTER-clause
conditional aggregates, concentration metrics, and wide→long unpivot.

Scale design (100 TB):

* ``dq_profile_columns`` is ONE pass over the table: every metric for
  every profiled column computes in a single aggregate (map-combined),
  then a constant-size ``stack`` reshapes 1×N into rows.  Profiling
  never re-scans per column.
* Referential checks are left-anti joins: the dimension key side
  broadcasts (customer/part/supplier keys are small relative to
  facts); counts are exact.
* ``agg_gini_concentration`` keeps everything integer (sum of squared
  counts) until one final double division — deterministic across
  engines with no float-sum ordering concerns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import dsum, register, sql_dsum


@register(
    "dq_profile_columns",
    oracle="""
    SELECT 'o_orderstatus' AS column_name,
           COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS n_nulls,
           COUNT(DISTINCT o_orderstatus) AS n_distinct,
           MIN(o_orderstatus) AS min_val, MAX(o_orderstatus) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) FILTER (WHERE o_orderpriority IS NULL),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', COUNT(*) FILTER (WHERE o_orderkey IS NULL),
           COUNT(DISTINCT o_orderkey),
           MIN(CAST(o_orderkey AS VARCHAR)), MAX(CAST(o_orderkey AS VARCHAR))
    FROM orders
    """,
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: nulls / distincts / min / max per column, one scan.

    All twelve metrics compute in a single aggregate over one pass
    (count-if-null, distinct, min, max × 3 columns); a constant-size
    ``stack`` then pivots the 1-row result long.  Values surface as
    VARCHAR (int→string casts are engine-identical; doubles are
    deliberately not profiled this way — float formatting is not)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", F.col("o_orderkey").cast("string")
    )
    nulls = lambda c: F.count(F.when(F.col(c).isNull(), 1)).alias(f"nn_{c}")
    agg = o.agg(
        *[nulls(c) for c in ("o_orderstatus", "o_orderpriority", "o_orderkey")],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in ("o_orderstatus", "o_orderpriority", "o_orderkey")],
        *[F.min(c).alias(f"mn_{c}") for c in ("o_orderstatus", "o_orderpriority", "o_orderkey")],
        *[F.max(c).alias(f"mx_{c}") for c in ("o_orderstatus", "o_orderpriority", "o_orderkey")],
    )
    return agg.selectExpr(
        """stack(3,
             'o_orderstatus',   nn_o_orderstatus,   nd_o_orderstatus,   mn_o_orderstatus,   mx_o_orderstatus,
             'o_orderpriority', nn_o_orderpriority, nd_o_orderpriority, mn_o_orderpriority, mx_o_orderpriority,
             'o_orderkey',      nn_o_orderkey,      nd_o_orderkey,      mn_o_orderkey,      mx_o_orderkey
           ) AS (column_name, n_nulls, n_distinct, min_val, max_val)"""
    )


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT 'orders->customer' AS relationship,
           COUNT(*) AS n_orphans
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->part', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem->supplier', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: fact rows whose FK misses its dim.

    Each check is a left-anti join with the key-only dim side (AQE
    picks the strategy — the dims scale with SF, so no forced hint); a healthy warehouse reports zeros — the operator exists to
    prove it.  Fact scans read only the FK column."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")

    def orphans(fact, dim, cond, name):
        return (
            fact.join(dim, cond, "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("relationship"), "n_orphans")
        )

    return (
        orphans(o, c, o.o_custkey == c.c_custkey, "orders->customer")
        .unionAll(
            orphans(
                l.select("l_partkey"), p, F.col("l_partkey") == p.p_partkey,
                "lineitem->part",
            )
        )
        .unionAll(
            orphans(
                l.select("l_suppkey"), s, F.col("l_suppkey") == s.s_suppkey,
                "lineitem->supplier",
            )
        )
    )


@register(
    "agg_filter_clause",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
           {sql_dsum('c_acctbal')} AS total_bal,
           CAST(CAST(SUM(CAST(CAST(c_acctbal AS VARCHAR) AS DECIMAL(30,8))) FILTER (WHERE c_acctbal < 0) AS VARCHAR) AS DOUBLE) AS neg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregates (SQL:2003 surface).

    Spark spells FILTER as sum/count over ``when`` with no otherwise
    (nulls are skipped — identical semantics, including an all-null
    group summing to NULL).  Decimal-accumulated sums at the edge."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("n_rich"),
        dsum(F.col("c_acctbal")).alias("total_bal"),
        dsum(F.when(F.col("c_acctbal") < 0, F.col("c_acctbal"))).alias("neg_bal"),
    )


@register(
    "agg_gini_concentration",
    oracle="""
    WITH cnt AS (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(SUM(n) AS BIGINT) AS n_orders,
           1.0 - CAST(SUM(n * n) AS DOUBLE) / (SUM(n) * SUM(n)) AS gini
    FROM cnt GROUP BY c_mktsegment
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration (Gini-Simpson) of order priorities per segment.

    Everything stays integer — counts, squared counts, totals — until
    one final double division, so the float edge is a single
    deterministic operation (no cross-row double summation at all)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cnt = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    return cnt.groupBy("c_mktsegment").agg(
        F.sum("n").alias("n_orders"),
        (
            F.lit(1.0)
            - F.sum(F.col("n") * F.col("n")).cast("double")
            / (F.sum("n") * F.sum("n"))
        ).alias("gini"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via ``DataFrame.unpivot`` (SQL UNPIVOT / melt).

    Narrow transform: no shuffle at all — each input row emits its
    value-column rows in place, and column pruning still reaches the
    scan (only the id + unpivoted columns are read)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "agg_weighted_avg",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum('l_extendedprice * l_quantity')}
             / {sql_dsum('l_quantity')} AS wavg_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag.

    sum(w·x)/sum(w) with both sums decimal-accumulated and divided in
    double at the edge — the deterministic spelling of weighted mean
    (a raw double sum would be shuffle-order dependent)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        (
            dsum(F.col("l_extendedprice") * F.col("l_quantity"))
            / dsum(F.col("l_quantity"))
        ).alias("wavg_price"),
        F.count("*").alias("n"),
    )


@register(
    "agg_boolean_flags",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > -999) AS all_above_floor,
           bool_or(c_acctbal > 9000) AS any_very_rich,
           COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
           CAST(COUNT(*) FILTER (WHERE c_acctbal > 0) AS DOUBLE) / COUNT(*) AS frac_positive
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_boolean_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any/count_if): the data-quality flags
    layer — all-rows invariants, existence flags, violation counts,
    and an exact integer-ratio fraction (single double division)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.every(F.col("c_acctbal") > -999).alias("all_above_floor"),
        F.some(F.col("c_acctbal") > 9000).alias("any_very_rich"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
        (
            F.count_if(F.col("c_acctbal") > 0).cast("double") / F.count("*")
        ).alias("frac_positive"),
    )


@register(
    "scalar_try_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity, 0) AS unit_price,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS line_roundtrip,
           l_tax / NULLIF(l_discount, 0) AS tax_over_discount
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def scalar_try_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe scalar battery: ``try_divide`` /
    ``try_cast`` return NULL where strict ANSI evaluation would raise.

    This repo runs Spark 4 with ANSI ON (overflow/div-zero/bad-cast
    all throw); the try_* family is how a pipeline opts into
    null-on-error per expression instead of disabling ANSI globally —
    the oracle spells the same semantics with NULLIF/TRY_CAST."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias("unit_price"),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias("flag_as_int"),
        F.try_to_number(F.col("l_linenumber").cast("string"), F.lit("9")).cast("int").alias(
            "line_roundtrip"
        ),
        F.try_divide(F.col("l_tax"), F.col("l_discount")).alias("tax_over_discount"),
    )


@register(
    "dq_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    j AS (
      SELECT e.event_type, e.value, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
      FROM j GROUP BY event_type
    ),
    j2 AS (
      SELECT j.event_type, j.value, j.med, mad.mad
      FROM j JOIN mad USING (event_type)
    )
    SELECT event_type, med, mad,
           CAST(COUNT(*) FILTER (abs(value - med) > 3 * 1.4826 * mad) AS BIGINT)
             AS n_outliers,
           COUNT(*) AS n,
           MAX(CASE WHEN mad > 0
                    THEN abs(value - med) / (1.4826 * mad) END) AS max_robust_z
    FROM j2 GROUP BY event_type, med, mad
    """,
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: median / MAD / count of
    |x − med| > 3·1.4826·MAD (the robust-z rule that survives the
    heavy tails that wreck mean/stddev fences).

    Two grouped exact percentiles with broadcast join-backs (group
    cardinality = event types, tiny).  Interpolation parity is the
    established ``percentile``/``quantile_cont`` identity
    (`relational.agg_percentile_exact`); everything after is per-row
    IEEE arithmetic plus exact counts.  At 100 TB swap the exact
    medians for ``percentile_approx`` (map-combinable sketch) — the
    fence rule is unchanged.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5D)").alias("med"))
    j = e.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5D)").alias("mad")
    )
    j2 = j.join(F.broadcast(mad), "event_type")
    dev = F.abs(F.col("value") - F.col("med"))
    fence = F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    # mad == 0 (a constant-valued group at tiny scales) must not hit
    # ANSI's divide-by-zero throw — the z column gates to NULL.
    robust_z = F.when(F.col("mad") > 0, dev / (F.lit(1.4826) * F.col("mad")))
    return j2.groupBy("event_type", "med", "mad").agg(
        F.count(F.when(dev > fence, F.lit(1))).alias("n_outliers"),
        F.count(F.lit(1)).alias("n"),
        F.max(robust_z).alias("max_robust_z"),
    )
