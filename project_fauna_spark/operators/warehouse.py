"""TPC-H-shaped warehouse queries, batch 2: subquery-heavy shapes.

Round-2 widening of the composed-analytics layer (`analytics.py`):
EXISTS / NOT EXISTS / NOT IN / correlated-average subqueries and
conditional-aggregation ratios — the decorrelation surface (TPC-H
Q4/Q8/Q12/Q14/Q16/Q17/Q22 shapes, adapted to the synthetic schema).

Scale design (100 TB):

* Every correlated subquery is expressed as the join Catalyst would
  decorrelate it into: EXISTS → left-semi, NOT EXISTS / NOT IN (on a
  non-null key) → left-anti, correlated AVG → a per-key aggregate
  joined back.  No nested-loop anywhere.
* Dimension sides (part subsets, supplier blocklist, nation) are
  broadcast; fact-fact joins shuffle on their keys with AQE.
* The Q17 threshold aggregate is computed only over lineitems of the
  filtered brand (semi-reduction first): per-partkey averages are
  unchanged by restricting to those partkeys, and the aggregate input
  drops ~98%.
* Ratio outputs divide two decimal-accumulated sums in double — the
  registry's deterministic-float convention (`registry.dsum`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import davg, dsum, register, sql_davg, sql_dsum


@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
                 / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue %).

    One month of lineitem joined to part (AQE picks the join strategy;
    part scales with SF so it is never hint-broadcast — dim at any
    scale — part is ~1/30 of lineitem and only p_type is read), then a
    single-pass conditional sum.  Both sums accumulate in decimal and
    divide in double at the edge."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("promo"),
            dsum(rev).alias("total"),
        )
        .select((100.0 * F.col("promo") / F.col("total")).alias("promo_pct"))
    )


@register(
    "q_avg_yearly_small_qty",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#16'
      AND l.l_quantity < (
        SELECT 0.2 * ({sql_davg('l2.l_quantity')})
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q_avg_yearly_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery → per-key agg join-back.

    Revenue of small-quantity lineitems (< 20% of the part's average
    order quantity) for one brand.  The correlated average is computed
    once per partkey — and only for partkeys of the brand (restricting
    to those keys leaves each per-key average unchanged while dropping
    ~98% of the aggregate's input).  Brand partkeys join without a
    broadcast hint (part scales with SF; AQE decides)."""
    part_b = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#16")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(part_b, li.l_partkey == part_b.p_partkey).drop("p_partkey")
    thresh = li_b.groupBy("l_partkey").agg(
        (0.2 * davg(F.col("l_quantity"))).alias("qty_thresh")
    )
    return (
        li_b.join(thresh.withColumnRenamed("l_partkey", "t_partkey"),
                  F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@register(
    "q_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN subquery → left-anti join, distinct agg.

    Distinct suppliers per (brand, type, size) slice, excluding
    negative-balance suppliers.  The NOT IN rewrites to an anti-join
    against the keys-only blocklist (AQE-sized join) — safe because s_suppkey
    is non-null; the distinct count is one partial-distinct shuffle."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(bad_supp, l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_dormant_rich_customers",
    oracle=f"""
    SELECT c.c_nationkey, COUNT(*) AS n_custs,
           {sql_dsum('c.c_acctbal')} AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT {sql_davg('c2.c_acctbal')} FROM customer c2 WHERE c2.c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-AVG subquery + NOT EXISTS → anti-join.

    Above-average-balance customers with no order since 2000, per
    nation.  The global positive-balance average is a 1-row broadcast
    cross join; NOT EXISTS decorrelates to a left-anti on o_custkey
    with the date filter pushed to the orders scan."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_custs"), dsum(F.col("c_acctbal")).alias("total_bal"))
    )


@register(
    "q_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           {sql_dsum("CASE WHEN n.n_name = 'NATION_7' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY year(o.o_orderdate)
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share per order year.

    Fact-fact join shuffles on orderkey; customer joins on custkey;
    nation broadcasts.  The share is a conditional/total ratio of two
    decimal-accumulated sums — group-level, no post-join subquery."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            dsum(F.when(F.col("n_name") == "NATION_7", rev).otherwise(F.lit(0))).alias("nat"),
            dsum(rev).alias("tot"),
        )
        .select("order_year", (F.col("nat") / F.col("tot")).alias("mkt_share"))
    )


@register(
    "q_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of order priority per flag.

    Shipdate-year filter pushes to the lineitem scan; the join
    shuffles on orderkey; counts are exact integer conditional sums
    (no float concerns)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
    SELECT a.o_custkey,
           a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           CAST(date_diff('day',
                GREATEST(CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE)),
                LEAST(CAST(a.o_orderdate AS DATE) + 14, CAST(b.o_orderdate AS DATE) + 14)
           ) AS INT) AS overlap_days
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.o_orderdate <= b.o_orderdate + INTERVAL 14 DAY
     AND b.o_orderdate <= a.o_orderdate + INTERVAL 14 DAY
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: order pairs of the same customer
    whose 14-day handling windows [orderdate, orderdate+14] intersect.

    The equi-key (o_custkey) carries the shuffle; the overlap band is
    evaluated inside the per-customer join — candidate pairs are
    bounded by per-customer order counts, never a global interval
    product.  (For key-free interval joins the same plan applies after
    bucketing time into coarse epochs and exploding each interval to
    its touched buckets — the band-join pattern in `join_range_band`.)"""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    a = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("o_orderdate").alias("date_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("cust_b"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("o_orderdate").alias("date_b"),
    )
    day = F.expr("INTERVAL 14 DAYS")
    joined = a.join(
        b,
        (a.o_custkey == b.cust_b)
        & (F.col("orderkey_a") < F.col("orderkey_b"))
        & (F.col("date_a") <= F.col("date_b") + day)
        & (F.col("date_b") <= F.col("date_a") + day),
    )
    end_a = F.date_add(F.col("date_a").cast("date"), 14)
    end_b = F.date_add(F.col("date_b").cast("date"), 14)
    return joined.select(
        "o_custkey",
        "orderkey_a",
        "orderkey_b",
        F.datediff(
            F.least(end_a, end_b),
            F.greatest(F.col("date_a").cast("date"), F.col("date_b").cast("date")),
        ).cast("int").alias("overlap_days"),
    )


@register(
    "join_mark_exists",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
             AS has_recent_order
    FROM customer c
    """,
)
def join_mark_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark join: EXISTS as a produced BOOLEAN column (not a filter) —
    every customer row survives, annotated with whether a recent order
    exists.

    Spelled as a left join against the distinct key set with a
    null-flag projection — the decorrelation engines use for
    EXISTS-in-SELECT.  The distinct side is keys-only (AQE-sized);
    no row duplication because keys are pre-deduplicated."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("rk"))
        .distinct()
    )
    return c.join(recent, c.c_custkey == F.col("rk"), "left").select(
        "c_custkey",
        "c_mktsegment",
        F.col("rk").isNotNull().alias("has_recent_order"),
    )


@register(
    "join_salted_equi",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority, COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(CAST(l.l_extendedprice AS VARCHAR) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS order_total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey < 2000
    GROUP BY o.o_orderkey, o.o_orderpriority
    """,
)
def join_salted_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the hot-key mitigation, verified row-identical
    to the plain join (the oracle IS the unsalted join).

    The fact side gets a deterministic per-row salt; the (unique-key)
    dim side explodes ×8 — each hot key's rows spread over 8 reducers
    instead of one straggler.  Salting is correctness-neutral for
    inner joins on unique build keys, which the oracle proves; AQE's
    runtime skew split is the automatic flavor, this is the explicit
    one for when a single key exceeds what one task can hold."""
    from project_fauna_spark.operators.skew import salted_join

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_orderpriority")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    joined = salted_join(l, o, big_key="l_orderkey", small_key="o_orderkey", n_salts=8)
    return joined.groupBy("o_orderkey", "o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        dsum(F.col("l_extendedprice")).alias("order_total"),
    )


@register(
    "q_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer-by-order-count histogram (two-level
    aggregation over a filtered LEFT join — zero-order customers must
    appear in the 0 bucket, so the filter lives IN the join condition,
    not a WHERE).

    Both aggregations map-combine; the join shuffles on custkey and
    the second agg's key (c_count) has trivial cardinality."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey, s.s_acctbal, s.s_name, s.s_nationkey
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    best AS (
      SELECT p.p_partkey, p.p_size,
             (min({'bal': sp.s_acctbal, 'sk': sp.l_suppkey})).sk AS best_suppkey,
             (min({'bal': sp.s_acctbal, 'sk': sp.l_suppkey})).bal AS best_acctbal
      FROM part p JOIN supply sp ON p.p_partkey = sp.l_partkey
      WHERE p.p_size = 15
      GROUP BY p.p_partkey, p.p_size
    )
    SELECT b.p_partkey, b.p_size, b.best_suppkey, b.best_acctbal, s.s_name
    FROM best b JOIN supplier s ON b.best_suppkey = s.s_suppkey
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp table): for each size-15
    part, the cheapest supplier actually supplying it (min account
    balance, suppkey tie-break), re-joined for supplier detail.

    The correlated MIN subquery is a struct-argmin aggregate over the
    (distinct) part-supplier supply pairs; the supplier detail join is
    an AQE-sized join.  The supply-pair dedup is the only big shuffle."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_size")
    )
    supply = l.join(
        s.select("s_suppkey", "s_acctbal"), l.l_suppkey == F.col("s_suppkey")
    )
    key = F.struct(F.col("s_acctbal").alias("bal"), F.col("l_suppkey").alias("sk"))
    best = (
        supply.join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_partkey", "p_size")
        .agg(
            F.min(key).getField("sk").alias("best_suppkey"),
            F.min(key).getField("bal").alias("best_acctbal"),
        )
    )
    return best.join(
        s.select("s_suppkey", "s_name"),
        best.best_suppkey == F.col("s_suppkey"),
    ).select("p_partkey", "p_size", "best_suppkey", "best_acctbal", "s_name")


@register(
    "q_nation_pair_volume",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_12')
        OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year,
    both directions.

    The nation-pair disjunction pushes into the BROADCAST nation dims
    (each side filtered to the 2-nation set before the join, the
    pair-direction predicate applied after) — so the fact shuffles are
    unchanged while the dims prune ~92% of customer/supplier rows via
    the broadcast hash sets."""
    pair = ("NATION_3", "NATION_12")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dsum(rev).alias("volume"))
    )


@register(
    "q_top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue
    — the scalar-MAX-subquery HAVING pattern (returns ALL tied rows,
    unlike a LIMIT 1).

    The revenue view computes once and feeds both the max and the
    equality filter; Spark reuses it via a broadcast 1-row max join.
    The decimal-accumulated revenue makes the equality comparison
    engine-stable (two bit-identical doubles)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )  # feeds both the max aggregate and the equality filter
    rev = cached(rev)
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q_disjunctive_predicates",
    oracle=f"""
    SELECT COUNT(*) AS n_matches,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides.

    The optimizer-pattern query: Catalyst derives the per-side
    implied disjunctions (p_brand IN (...), l_quantity BETWEEN
    min..max of any branch) and pushes them below the join, so each
    scan prunes before pairing; the exact 3-branch predicate applies
    inside the join.  Expressed as one declarative filter — no manual
    union-of-three-joins."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = lambda brand, s1, s2, q1, q2: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s1, s2)
        & F.col("l_quantity").between(q1, q2)
    )
    cond = (
        branch("Brand#12", 1, 15, 1, 21)
        | branch("Brand#23", 10, 30, 10, 30)
        | branch("Brand#34", 20, 50, 20, 40)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count("*").alias("n_matches"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "q_waiting_orders_sole_blame",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      GROUP BY 1, 2
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    """,
)
def q_waiting_orders_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a late order —
    the EXISTS + NOT-EXISTS double-correlation on the same fact.

    Decorrelated once via per-order aggregates instead of two
    correlated probes: n_suppliers and n_late_suppliers per order,
    joined back to the late pairs (multi-supplier order AND exactly
    one late supplier ⇔ the original EXISTS ∧ NOT EXISTS).  Three
    shuffles on l_orderkey total, each map-combined."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )  # feeds the pair set AND the per-order late-supplier count
    late = cached(late)
    n_supp = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    n_late = late.groupBy(F.col("l_orderkey").alias("lo")).agg(
        F.count("*").alias("n_late_suppliers")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(n_supp, "l_orderkey")
        .join(n_late, late.l_orderkey == F.col("lo"))
        .filter((F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q_dominant_part_suppliers",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(30,8))) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, SUM(q) AS qt FROM per GROUP BY 1)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT p.l_suppkey FROM per p JOIN tot t ON p.l_partkey = t.l_partkey
      WHERE p.q * 5 > t.qt
    )
    """,
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a nested aggregate-with-HAVING —
    suppliers providing more than 20% of some part's total quantity.

    The nested aggregate chains two groupBys that share the
    (l_partkey) shuffle; the dominance test is an exact DECIMAL
    comparison (q*5 > total, no division, no float edge); the IN
    decorrelates to a left-semi join on the (tiny) dominant-supplier
    key set."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias("q")
    )
    tot = per.groupBy(F.col("l_partkey").alias("pk")).agg(F.sum("q").alias("qt"))
    dominant = (
        per.join(tot, per.l_partkey == F.col("pk"))
        .filter(F.col("q") * 5 > F.col("qt"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")


@register(
    "q_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity')} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — supply cost proxied by 10% of retail
    price, no partsupp table): profit per supplier nation per order
    year for one product family.

    The p_name filter prunes part FIRST (AQE-sized join), cascading the
    selectivity through the lineitem join before orders joins in; the
    profit expression accumulates in decimal (sum of differences —
    exactly the shuffle-order-sensitive shape dsum exists for)."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(dsum(profit).alias("profit"))
    )


@register(
    "q_important_stock_value",
    oracle=f"""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(30,8))) AS v
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey,
           CAST(CAST(v AS VARCHAR) AS DOUBLE) AS part_value
    FROM val
    WHERE v * (SELECT COUNT(*) FROM val) > (SELECT SUM(v) * 1.5 FROM val)
    """,
)
def q_important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (supply value proxied by lineitem extended
    price — no partsupp table): parts whose total traded value exceeds
    1.5x the average part's value (a scale-stable concentration cut).

    The per-part aggregate computes once and feeds both the global
    scalar (1-row broadcast) and the filter; the threshold comparison
    happens in exact DECIMAL (the double cast is only the output
    edge), so the cut line is engine-identical."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).alias("v")
    )  # feeds the global scalar and the filter
    val = cached(val)
    total = val.agg(
        (F.sum("v") * F.lit(1.5).cast("decimal(2,1)")).alias("thresh"),
        F.count("*").alias("n_parts"),
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v") * F.col("n_parts") > F.col("thresh"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )
