"""Round-6 batch 2: paragraph-granular dedup, Matryoshka prefix-recall,
IVF nprobe tuning sweep, zone-map pruning simulation, date-spine
gap-fill.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).

Scale notes (100 TB):

* ``dedup_paragraph_hash`` is the C4/RefinedWeb paragraph-dedup stage:
  the shuffle carries 16-byte md5 digests (never paragraph text), the
  duplicate set comes from a map-combined digest aggregate, and the
  per-doc verdict is an integer cross-multiplication.
* ``sim_matryoshka_prefix_recall`` audits the MRL funnel (cheap
  prefix-dim ranking feeding a full-dim rerank) — the production
  pattern for cutting ANN scan cost 4× without a new index.
* ``sim_ivf_nprobe_sweep`` closes the IVF tuning loop the way
  ``dedup_minhash_recall_audit`` closes MinHash banding: measured
  recall per nprobe against exact truth, all-integer until one
  division.
* ``layout_zone_map_pruning`` quantifies WHY layout matters: the same
  zone maps prune ~99% of files after a date-clustered rewrite and
  ~0% under a hash-scattered layout — the number a table optimizer
  acts on when deciding whether a Z-order/clustering rewrite pays.
* ``ts_date_spine_gapfill`` is the calendar-spine generation pattern
  (sequence + explode): the spine is bounded by each user's own span,
  so the explode never exceeds rows × max-span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# dedup_paragraph_hash — C4-style paragraph-granular dedup
# --------------------------------------------------------------------------


@register(
    "dedup_paragraph_hash",
    oracle="""
    WITH paras AS (
      SELECT doc_id, md5(unnest(string_split(text, '. '))) AS ph
      FROM documents
    ),
    df AS (
      SELECT ph, COUNT(DISTINCT doc_id) AS n_docs FROM paras GROUP BY ph
    )
    SELECT p.doc_id,
           COUNT(*) AS n_paras,
           CAST(COUNT(*) FILTER (WHERE df.n_docs > 1) AS BIGINT) AS n_dup_paras,
           CAST(COUNT(*) FILTER (WHERE df.n_docs > 1) AS DOUBLE) / COUNT(*)
             AS dup_frac,
           COUNT(*) FILTER (WHERE df.n_docs > 1) * 2 > COUNT(*) AS drop_doc
    FROM paras p JOIN df ON df.ph = p.ph
    GROUP BY p.doc_id
    """,
)
def dedup_paragraph_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular dedup (the C4/RefinedWeb recipe): split each
    document into paragraphs, md5 each, and flag documents where more
    than half the paragraphs also appear in OTHER documents —
    boilerplate and syndicated content that document-level exact dedup
    misses entirely.

    md5 is the SQL-portable digest twin (``dedup_simhash_md5``
    convention), so the graded edge carries real counts, not booleans.
    Scale: the explode ships (doc_id, 16-byte digest) only; the
    cross-doc frequency is one map-combined digest aggregate; the
    verdict is an integer cross-multiplication (no float threshold).
    At 100 TB this is the same inverted-index discipline as the
    shingle dedup — a hot boilerplate paragraph costs one aggregate
    row, never a pair explosion, because the query joins paragraphs
    back to their docs (linear), not docs to docs (quadratic).
    """
    d = load_table(spark, sf_dir, "documents")
    paras = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\. ")).alias("para")
    ).select("doc_id", F.md5(F.col("para")).alias("ph"))
    paras = cached(paras)
    df_p = paras.groupBy("ph").agg(F.countDistinct("doc_id").alias("n_docs"))
    joined = paras.join(df_p, "ph")
    dup = (F.col("n_docs") > 1).cast("long")
    agg = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(dup).cast("long").alias("n_dup_paras"),
    )
    return agg.select(
        "doc_id",
        "n_paras",
        "n_dup_paras",
        (F.col("n_dup_paras").cast("double") / F.col("n_paras")).alias("dup_frac"),
        (F.col("n_dup_paras") * 2 > F.col("n_paras")).alias("drop_doc"),
    )


# --------------------------------------------------------------------------
# sim_matryoshka_prefix_recall — MRL prefix-dimension funnel audit
# --------------------------------------------------------------------------

_MRL_PREFIX = 16
_MRL_TOPK = 10
_MRL_QUERY_MOD = 100

_SQL_DOT_FULL = (
    "list_reduce(list_transform(range(1, len({a})+1),"
    " i -> {a}[i] * {b}[i]), (s, v) -> s + v)"
)
_SQL_DOT_PREFIX = (
    f"list_reduce(list_transform(range(1, {_MRL_PREFIX}+1),"
    " i -> {a}[i] * {b}[i]), (s, v) -> s + v)"
)


@register(
    "sim_matryoshka_prefix_recall",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e
          WHERE vec_id % {_MRL_QUERY_MOD} = 0),
    pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_SQL_DOT_FULL.format(a="q.qemb", b="e.emb")} AS dp_full,
             {_SQL_DOT_PREFIX.format(a="q.qemb", b="e.emb")} AS dp_prefix
      FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    full_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dp_full DESC, neighbor_id) AS rn
        FROM pairs) WHERE rn <= {_MRL_TOPK}
    ),
    prefix_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dp_prefix DESC, neighbor_id) AS rn
        FROM pairs) WHERE rn <= {_MRL_TOPK}
    )
    SELECT f.query_id,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(p.neighbor_id) AS DOUBLE) / {_MRL_TOPK} AS prefix_recall
    FROM full_top f
    LEFT JOIN prefix_top p
      ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-embedding funnel audit: how much of the exact
    full-dimension top-10 survives when ranking uses only the leading
    16 of 64 dims — the number that says whether the MRL serving
    funnel (cheap prefix scan → full-dim rerank of survivors) can cut
    scan cost 4× at a given candidate multiplier.

    Both rankings are index-ordered double folds (``sim_ann_ivf``
    convention) with unique-id tie-breaks; recall is one division of
    exact integers.  Scale: queries are a fixed-modulus sample, so the
    truth join is broadcast-bounded; the production funnel this audits
    scans prefix dims for the corpus (¼ the bytes, same partitioning)
    and reranks only top-k·ε candidates at full width.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    q = e.filter(F.col("vec_id") % _MRL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dp_full = F.aggregate(
        F.zip_with("qemb", "emb", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    dp_prefix = F.aggregate(
        F.zip_with(
            F.slice("qemb", 1, _MRL_PREFIX),
            F.slice("emb", 1, _MRL_PREFIX),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dp_full.alias("dp_full"),
        dp_prefix.alias("dp_prefix"),
    )
    scored = cached(scored)
    w_full = W.partitionBy("query_id").orderBy(F.col("dp_full").desc(), "neighbor_id")
    w_pre = W.partitionBy("query_id").orderBy(
        F.col("dp_prefix").desc(), "neighbor_id"
    )
    full_top = (
        scored.withColumn("rn", F.row_number().over(w_full))
        .filter(F.col("rn") <= _MRL_TOPK)
        .select("query_id", "neighbor_id")
    )
    prefix_top = (
        scored.withColumn("rn", F.row_number().over(w_pre))
        .filter(F.col("rn") <= _MRL_TOPK)
        .select(
            F.col("query_id").alias("p_query_id"),
            F.col("neighbor_id").alias("p_neighbor_id"),
        )
    )
    return (
        full_top.join(
            prefix_top,
            (F.col("query_id") == F.col("p_query_id"))
            & (F.col("neighbor_id") == F.col("p_neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("p_neighbor_id").alias("n_overlap"),
            (F.count("p_neighbor_id").cast("double") / F.lit(float(_MRL_TOPK))).alias(
                "prefix_recall"
            ),
        )
    )


# --------------------------------------------------------------------------
# sim_ivf_nprobe_sweep — IVF recall-vs-nprobe tuning curve
# --------------------------------------------------------------------------

_SWEEP_MAX_NPROBE = 4
_SWEEP_TOPK = 5


def _nprobe_sweep_oracle() -> str:
    from project_fauna_spark.operators.llm_extras import _ivf_sql_values

    dot = _SQL_DOT_FULL
    return f"""
    WITH cents(k, c) AS (VALUES {_ivf_sql_values()}),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    scored AS (
      SELECT e.vec_id, e.emb, cents.k,
             {dot.format(a="e.emb", b="cents.c")} AS dp
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, emb, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, emb AS qemb, k AS cell, rn AS cell_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored WHERE vec_id % {_MRL_QUERY_MOD} = 0)
      WHERE rn <= {_SWEEP_MAX_NPROBE}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {dot.format(a="p.qemb", b="e.emb")} DESC,
                                           e.vec_id) AS rn
        FROM (SELECT DISTINCT query_id, qemb FROM probes) p
        JOIN e ON e.vec_id <> p.query_id) WHERE rn <= {_SWEEP_TOPK}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             MIN(p.cell_rank) AS min_rank,
             {dot.format(a="p.qemb", b="a.emb")} AS dp
      FROM probes p JOIN assigned a USING (cell)
      WHERE a.vec_id <> p.query_id
      GROUP BY p.query_id, a.vec_id, {dot.format(a="p.qemb", b="a.emb")}
    ),
    sweep AS (SELECT unnest(range(1, {_SWEEP_MAX_NPROBE} + 1)) AS nprobe),
    ivf_top AS (
      SELECT nprobe, query_id, neighbor_id FROM (
        SELECT s.nprobe, c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY s.nprobe, c.query_id
                                  ORDER BY c.dp DESC, c.neighbor_id) AS rn
        FROM sweep s JOIN cand c ON c.min_rank <= s.nprobe)
      WHERE rn <= {_SWEEP_TOPK}
    )
    SELECT s.nprobe,
           CAST((SELECT COUNT(DISTINCT query_id) FROM probes) AS BIGINT)
             AS n_queries,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(i.neighbor_id) AS DOUBLE)
             / ((SELECT COUNT(DISTINCT query_id) FROM probes) * {_SWEEP_TOPK})
             AS recall_at_{_SWEEP_TOPK}
    FROM sweep s
    CROSS JOIN truth t
    LEFT JOIN ivf_top i ON i.nprobe = s.nprobe
                       AND i.query_id = t.query_id
                       AND i.neighbor_id = t.neighbor_id
    GROUP BY s.nprobe
    """


@register("sim_ivf_nprobe_sweep", oracle_builder=_nprobe_sweep_oracle)
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve: exact recall@5 against brute-force truth for
    nprobe = 1..4 — the measurement that picks an index's operating
    point (recall vs fraction-of-corpus-scanned), closing the IVF
    tuning loop the way ``dedup_minhash_recall_audit`` closes MinHash
    banding.

    Candidates are computed ONCE with each neighbor's best (lowest)
    probed-cell rank; the sweep is then a tiny range join on
    ``min_rank <= nprobe`` — probing 4 budgets costs one candidate
    pass, not four.  Hit counts are integers; recall is one division.
    Scale: truth is bounded to the fixed-modulus query sample
    (broadcast); the candidate join is EQUI on cell id; nothing
    all-pairs.
    """
    from project_fauna_spark.operators.llm_extras import _IVF_K, _ivf_centroid

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    cents = spark.createDataFrame(
        [(k, _ivf_centroid(k)) for k in range(_IVF_K)], schema="k int, c array<double>"
    )
    dp_c = F.aggregate(
        F.zip_with("emb", "c", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "emb", "k", dp_c.alias("dp")
    )
    w_cell = W.partitionBy("vec_id").orderBy(F.col("dp").desc(), F.col("k").desc())
    # Both the corpus assignment and the probe list read the ranked
    # frame — persist it so the codebook scoring + window run once.
    ranked = cached(scored.withColumn("rn", F.row_number().over(w_cell)))
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "emb", F.col("k").alias("cell")
    )
    probes = (
        ranked.filter(
            (F.col("vec_id") % _MRL_QUERY_MOD == 0) & (F.col("rn") <= _SWEEP_MAX_NPROBE)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qemb"),
            F.col("k").alias("cell"),
            F.col("rn").alias("cell_rank"),
        )
    )
    probes = cached(probes)
    queries = probes.select("query_id", "qemb").distinct()
    dp_q = F.aggregate(
        F.zip_with("qemb", "emb", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    w_truth = W.partitionBy("query_id").orderBy(F.col("dp").desc(), "neighbor_id")
    truth = (
        e.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), dp_q.alias("dp"))
        .withColumn("rn", F.row_number().over(w_truth))
        .filter(F.col("rn") <= _SWEEP_TOPK)
        .select("query_id", "neighbor_id")
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell_rank",
            dp_q.alias("dp"),
        )
        .groupBy("query_id", "neighbor_id", "dp")
        .agg(F.min("cell_rank").alias("min_rank"))
    )
    sweep = spark.range(1, _SWEEP_MAX_NPROBE + 1).select(
        F.col("id").cast("int").alias("nprobe")
    )
    w_ivf = W.partitionBy("nprobe", "query_id").orderBy(
        F.col("dp").desc(), "neighbor_id"
    )
    ivf_top = (
        F.broadcast(sweep)
        .join(cand, F.col("min_rank") <= F.col("nprobe"))
        .withColumn("rn", F.row_number().over(w_ivf))
        .filter(F.col("rn") <= _SWEEP_TOPK)
        .select(
            F.col("nprobe").alias("i_nprobe"),
            F.col("query_id").alias("i_query_id"),
            F.col("neighbor_id").alias("i_neighbor_id"),
        )
    )
    n_queries = queries.agg(F.count("*").alias("n_queries"))
    hits = (
        sweep.crossJoin(truth)
        .join(
            ivf_top,
            (F.col("i_nprobe") == F.col("nprobe"))
            & (F.col("i_query_id") == F.col("query_id"))
            & (F.col("i_neighbor_id") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("nprobe")
        .agg(F.count("i_neighbor_id").alias("n_hits"))
    )
    return (
        hits.crossJoin(F.broadcast(n_queries))
        .select(
            "nprobe",
            F.col("n_queries").cast("long").alias("n_queries"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (
                F.col("n_hits").cast("double")
                / (F.col("n_queries") * F.lit(_SWEEP_TOPK))
            ).alias(f"recall_at_{_SWEEP_TOPK}"),
        )
    )


# --------------------------------------------------------------------------
# layout_zone_map_pruning — file-skipping simulation, clustered vs scattered
# --------------------------------------------------------------------------


@register(
    "layout_zone_map_pruning",
    oracle="""
    WITH fc AS (
      SELECT date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) // 32 AS file_id,
             MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx
      FROM orders GROUP BY 1
    ),
    fs AS (
      SELECT ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) % 8
               AS file_id,
             MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx
      FROM orders GROUP BY 1
    ),
    months AS (
      SELECT DISTINCT date_trunc('month', o_orderdate) AS lo,
             date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS hi
      FROM orders
    )
    SELECT strftime(m.lo, '%Y-%m') AS pred_month,
           CAST((SELECT COUNT(*) FROM fc) AS BIGINT) AS n_files_clustered,
           CAST(COUNT(DISTINCT CASE WHEN fc.mx >= m.lo AND fc.mn < m.hi
                                    THEN fc.file_id END) AS BIGINT)
             AS scanned_clustered,
           CAST((SELECT COUNT(*) FROM fs) AS BIGINT) AS n_files_scattered,
           CAST((SELECT COUNT(*) FROM fs ss
                 WHERE ss.mx >= m.lo AND ss.mn < m.hi) AS BIGINT)
             AS scanned_scattered
    FROM months m CROSS JOIN fc
    GROUP BY m.lo, m.hi
    """,
)
def layout_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) file-skipping simulation: for each
    month predicate, how many simulated files must be scanned after a
    date-clustered rewrite (files hold 32-day key ranges, so every
    zone map is tight and a month predicate touches ~1-2 files) versus
    a hash-scattered layout (every file spans nearly the full date
    range — zone maps prune only boundary months).  This difference IS
    the business case for clustering/Z-ordering; ``layout_zorder_
    stats`` measures the layout, this measures the scan cost it buys.
    (This corpus's orderkey does NOT correlate with orderdate, so an
    insertion-ordered layout prunes as badly as the scattered one —
    exactly the situation where the rewrite pays.)

    All counts are exact integers from two tiny per-file aggregates
    (one per layout) joined against a distinct-month predicate list —
    at 100 TB zone maps live in table-format metadata and this query
    is the planner's pruning estimate, one row per (predicate, layout).
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    fc = o.groupBy(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') div 32"
        ).alias("file_id")
    ).agg(F.min("o_orderdate").alias("mn"), F.max("o_orderdate").alias("mx"))
    fs = o.groupBy(
        (F.ascii(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)) % 8)
        .alias("file_id")
    ).agg(F.min("o_orderdate").alias("mn"), F.max("o_orderdate").alias("mx"))
    months = (
        o.select(F.date_trunc("month", "o_orderdate").alias("lo"))
        .distinct()
        .select("lo", F.add_months(F.col("lo"), 1).alias("hi"))
    )
    n_fc = fc.agg(F.count("*").alias("n_files_clustered"))
    n_fs = fs.agg(F.count("*").alias("n_files_scattered"))
    scan_c = (
        F.broadcast(months)
        .join(fc, (F.col("mx") >= F.col("lo")) & (F.col("mn") < F.col("hi")))
        .groupBy("lo")
        .agg(F.countDistinct("file_id").alias("scanned_clustered"))
    )
    scan_s = (
        F.broadcast(months)
        .join(fs, (F.col("mx") >= F.col("lo")) & (F.col("mn") < F.col("hi")))
        .groupBy("lo")
        .agg(F.count("*").alias("scanned_scattered"))
    )
    return (
        months.join(scan_c, "lo", "left")
        .join(scan_s, "lo", "left")
        .crossJoin(F.broadcast(n_fc))
        .crossJoin(F.broadcast(n_fs))
        .select(
            F.date_format("lo", "yyyy-MM").alias("pred_month"),
            F.col("n_files_clustered").cast("long").alias("n_files_clustered"),
            F.coalesce(F.col("scanned_clustered"), F.lit(0))
            .cast("long")
            .alias("scanned_clustered"),
            F.col("n_files_scattered").cast("long").alias("n_files_scattered"),
            F.coalesce(F.col("scanned_scattered"), F.lit(0))
            .cast("long")
            .alias("scanned_scattered"),
        )
    )


# --------------------------------------------------------------------------
# ts_date_spine_gapfill — calendar-spine generation + activity coverage
# --------------------------------------------------------------------------


@register(
    "ts_date_spine_gapfill",
    oracle="""
    WITH act AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    ),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM act GROUP BY user_id
    ),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ),
    j AS (
      SELECT s.user_id, s.day, a.user_id IS NOT NULL AS active
      FROM spine s LEFT JOIN act a
        ON a.user_id = s.user_id AND a.day = s.day
    )
    SELECT user_id,
           COUNT(*) AS n_days_span,
           CAST(COUNT(*) FILTER (WHERE active) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) FILTER (WHERE NOT active) AS BIGINT) AS n_gap_days,
           CAST(COUNT(*) FILTER (WHERE active) AS DOUBLE) / COUNT(*)
             AS activity_ratio,
           strftime(MIN(CASE WHEN NOT active THEN day END), '%Y-%m-%d')
             AS first_gap_day
    FROM j GROUP BY user_id
    """,
)
def ts_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap-fill: generate each user's full daily date
    spine between their first and last event (``sequence`` + explode —
    the densification pattern every reporting pipeline needs before
    window math can see zero-activity days), left-join actual activity,
    and report coverage plus the first silent day.

    The spine explode is bounded per user by their own span (never a
    global calendar cross join); activity is pre-aggregated to
    (user, day) before the join, so the spine join is id+date equi.
    Counts are integers; the ratio is one division; the gap day is a
    formatted date string (no timestamp-type edge).
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    act = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    act = cached(act)
    span = act.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(
        act.withColumn("active", F.lit(True)), ["user_id", "day"], "left"
    ).withColumn("active", F.coalesce(F.col("active"), F.lit(False)))
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_days_span"),
        F.sum(F.col("active").cast("long")).cast("long").alias("n_active_days"),
        F.sum((~F.col("active")).cast("long")).cast("long").alias("n_gap_days"),
        (
            F.sum(F.col("active").cast("long")).cast("double") / F.count("*")
        ).alias("activity_ratio"),
        F.date_format(
            F.min(F.when(~F.col("active"), F.col("day"))), "yyyy-MM-dd"
        ).alias("first_gap_day"),
    )
