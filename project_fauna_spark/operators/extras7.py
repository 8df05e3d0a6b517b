"""Round-6 operator additions.

New module per the rotation discipline (CLAUDE.md): registrations
added mid-round must NEVER land in a module at or before the grading
window, so every round's new operators live in a fresh module imported
after the window block in ``plans/__init__.py``.

This batch extends the training-data / lakehouse surface:

* ``sim_ivf_pq_search`` — the full IVFADC composition (coarse IVF
  cells for candidate generation + product-quantization asymmetric
  distance for ranking): the actual billion-vector index layout
  (FAISS IVFPQ), built from the repo's existing IVF and PQ pieces.
* ``llm_microbatch_padding`` — inference-side length-bucketed
  microbatching with an exact padding-waste audit (the serving twin of
  ``llm_packing_efficiency``), using the de-skewed two-phase rank.
* ``event_time_to_convert`` — conversion-latency distribution per
  signup cohort with exact rank-selected percentiles (no interpolated
  aggregate, no low-cardinality window funnel).
* ``layout_deletion_vector_stats`` — merge-on-read deletion-vector
  audit per partition (Delta/Iceberg DV pattern): density, read
  amplification, rewrite recommendation.
* ``llm_span_corruption_plan`` — T5/UL2 span-corruption planning in
  pure integer arithmetic (corruption budget, span count, sequence
  length accounting per document).
* ``ml_chi2_term_selection`` — chi-square term↔language association
  for the top-df vocabulary (feature selection / corpus contrast),
  log-free by construction.

Float parity follows the repo rules (memory: cross-engine-float-parity):
integer counts end-to-end; every compared double is either a fixed-
association expression evaluated identically in both engines or a
single division of exact integers; windows tie-break on unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# sim_ivf_pq_search — IVF candidate generation + PQ asymmetric distance
# --------------------------------------------------------------------------

_IVFPQ_NPROBE = 2
_IVFPQ_TOPK = 5
_IVFPQ_QUERY_MOD = 100  # queries = corpus vectors with vec_id % 100 == 0


def _ivfpq_oracle() -> str:
    # Lazy imports: llm_extras/extras6 are registering modules — a
    # module-level import would pull their registrations forward and
    # perturb the grading window (CLAUDE.md).  oracle_builder runs at
    # resolve time, after all modules imported.
    from project_fauna_spark.operators.extras6 import (
        _PQ_DSUB,
        _PQ_K,
        _PQ_M,
        _pq_codeword,
    )
    from project_fauna_spark.operators.llm_extras import _ivf_sql_values

    cb_rows = ", ".join(
        f"({s}, {c}, "
        + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in _pq_codeword(s, c))
        + ")"
        for s in range(_PQ_M)
        for c in range(_PQ_K)
    )
    dist = (
        "(((x1-w1)*(x1-w1) + (x2-w2)*(x2-w2)) + (x3-w3)*(x3-w3))"
        " + (x4-w4)*(x4-w4)"
    )
    return f"""
    WITH cents(k, c) AS (VALUES {_ivf_sql_values()}),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    scored AS (
      SELECT e.vec_id, cents.k,
             list_reduce(list_transform(range(1, len(e.emb)+1),
                                        i -> e.emb[i] * cents.c[i]),
                         (s, v) -> s + v) AS dp
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored) WHERE rn = 1
    ),
    sub AS (
      SELECT vec_id, g.s,
             CAST(embedding[g.s*{_PQ_DSUB} + 1] AS DOUBLE) AS x1,
             CAST(embedding[g.s*{_PQ_DSUB} + 2] AS DOUBLE) AS x2,
             CAST(embedding[g.s*{_PQ_DSUB} + 3] AS DOUBLE) AS x3,
             CAST(embedding[g.s*{_PQ_DSUB} + 4] AS DOUBLE) AS x4
      FROM embeddings, (SELECT unnest(range({_PQ_M})) AS s) g
    ),
    cb(s, c, w1, w2, w3, w4) AS (VALUES {cb_rows}),
    codes AS (
      SELECT vec_id, s, c FROM (
        SELECT sub.vec_id, sub.s, cb.c,
               row_number() OVER (PARTITION BY sub.vec_id, sub.s
                                  ORDER BY {dist}, cb.c) AS rn
        FROM sub JOIN cb ON cb.s = sub.s) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, k AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dp DESC, k DESC) AS rn
        FROM scored WHERE vec_id % {_IVFPQ_QUERY_MOD} = 0)
      WHERE rn <= {_IVFPQ_NPROBE}
    ),
    lut AS (
      SELECT sub.vec_id AS query_id, sub.s, cb.c, {dist} AS qd
      FROM sub JOIN cb ON cb.s = sub.s
      WHERE sub.vec_id % {_IVFPQ_QUERY_MOD} = 0
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.cell
      FROM probes p JOIN assigned a USING (cell)
      WHERE a.vec_id <> p.query_id
    ),
    adc0 AS (
      SELECT cand.query_id, cand.neighbor_id, cand.cell,
             MAX(CASE WHEN codes.s = 0 THEN lut.qd END) AS q0,
             MAX(CASE WHEN codes.s = 1 THEN lut.qd END) AS q1,
             MAX(CASE WHEN codes.s = 2 THEN lut.qd END) AS q2,
             MAX(CASE WHEN codes.s = 3 THEN lut.qd END) AS q3
      FROM cand
      JOIN codes ON codes.vec_id = cand.neighbor_id
      JOIN lut ON lut.query_id = cand.query_id
              AND lut.s = codes.s AND lut.c = codes.c
      GROUP BY cand.query_id, cand.neighbor_id, cand.cell
    )
    SELECT query_id, neighbor_id, cell, adc_dist, rank FROM (
      SELECT query_id, neighbor_id, cell,
             ((q0 + q1) + q2) + q3 AS adc_dist,
             CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY ((q0 + q1) + q2) + q3, neighbor_id) AS INT) AS rank
      FROM adc0) WHERE rank <= {_IVFPQ_TOPK}
    """


@register("sim_ivf_pq_search", oracle_builder=_ivfpq_oracle)
def sim_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (Jégou et al.): IVF coarse cells generate candidates,
    PQ asymmetric distance ranks them — the composition that serves
    billion-vector ANN in production (FAISS IVFPQ layout).

    Pipeline: (1) every corpus vector is assigned to its nearest of 8
    IVF centroids (argmax dot product — one narrow pass over a
    broadcast codebook); (2) every corpus vector is PQ-encoded into 4
    one-byte codes over the leading 16 dims (broadcast 32-row
    codebook); (3) each query (every 100th vector) probes its
    ``nprobe`` = 2 best cells; (4) candidates = EQUI join on cell id;
    (5) ranking sums the 4 query→codeword LUT entries selected by each
    candidate's codes — no float vector is ever shuffled for ranking.

    Float parity: assignment distances and the per-query LUT are the
    same fixed-association expressions evaluated in both engines over
    literal-injected codebooks (the sim_pq_adc convention); dot
    products are index-ordered folds (the sim_ann_ivf convention);
    ``adc_dist`` is a fixed-order sum of four such doubles; every
    window tie-breaks on a unique id.

    Scale: codebooks broadcast (8 + 32 rows); the candidate shuffle
    carries (query_id, neighbor_id, cell) ints plus 4 one-byte codes —
    64× less state than raw float32; cells shard naturally into
    partitions, so probing reads nprobe/K of the corpus, and the LUT
    join is broadcast-sized (n_queries × 32).
    """
    from project_fauna_spark.operators.extras6 import (
        _PQ_DSUB,
        _PQ_K,
        _PQ_M,
        _pq_codeword,
    )
    from project_fauna_spark.operators.llm_extras import _IVF_K, _ivf_centroid

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # (1) IVF assignment: argmax dot product over the broadcast codebook.
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    cents = spark.createDataFrame(
        [(k, _ivf_centroid(k)) for k in range(_IVF_K)], schema="k int, c array<double>"
    )
    dp = F.aggregate(
        F.zip_with("emb", "c", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    scored = (
        e.select("vec_id", emb_d.alias("emb"))
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "k", dp.alias("dp"))
    )
    scored = cached(scored)
    w_cell = W.partitionBy("vec_id").orderBy(F.col("dp").desc(), F.col("k").desc())
    # Argmax cell via the repo's struct-extrema aggregate instead of a
    # row_number window (r12): max(struct(dp, k)) is the lexicographic
    # max = first row under ORDER BY dp DESC, k DESC — identical cell
    # per vector — and the hash aggregate is map-combined with no sort,
    # where the window spelling sorted all |corpus|×K scored rows
    # (guide §2.3: aggregate before you shuffle).
    assigned = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("dp"), F.col("k"))).getField("k").alias("cell")
    )

    # (2) PQ codes for the corpus + (5') per-query LUT share one
    # subvector frame (4 leading subspaces).
    subs = [
        F.struct(
            F.lit(s).alias("s"),
            *[
                F.element_at("embedding", s * _PQ_DSUB + i + 1)
                .cast("double")
                .alias(f"x{i + 1}")
                for i in range(_PQ_DSUB)
            ],
        )
        for s in range(_PQ_M)
    ]
    sub = e.select("vec_id", F.explode(F.array(*subs)).alias("t")).select(
        "vec_id", "t.*"
    )
    cb = spark.createDataFrame(
        [(s, c, *_pq_codeword(s, c)) for s in range(_PQ_M) for c in range(_PQ_K)],
        "s int, c int, w1 double, w2 double, w3 double, w4 double",
    )
    sq = lambda i: (F.col(f"x{i}") - F.col(f"w{i}")) * (  # noqa: E731
        F.col(f"x{i}") - F.col(f"w{i}")
    )
    dist = ((sq(1) + sq(2)) + sq(3)) + sq(4)
    # Argmin codeword via min(struct(dist, c)) — the lexicographic min
    # equals the first row under ORDER BY dist, c, so the PQ code per
    # (vec_id, s) is identical; the sort-based row_number window over
    # |corpus|×M×K rows becomes a map-combined aggregate (r12).
    codes = (
        sub.join(F.broadcast(cb), "s")
        .withColumn("dist", dist)
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct(F.col("dist"), F.col("c"))).getField("c").alias("c"))
    )

    # (3) probes: nprobe best cells per query vector.
    probes = (
        scored.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0)
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") <= _IVFPQ_NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("k").alias("cell"))
    )
    # per-query LUT: query subvector × broadcast codebook (nq·M·K rows).
    lut = (
        sub.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0)
        .join(F.broadcast(cb), "s")
        .select(
            F.col("vec_id").alias("query_id"), "s", "c", dist.alias("qd")
        )
    )

    # (4) candidates via the probed-cell equi join, then (5) ADC.
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cell")
    )
    adc0 = (
        cand.join(codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(lut), ["query_id", "s", "c"])
        .groupBy("query_id", "neighbor_id", "cell")
        .agg(
            *[
                F.max(F.when(F.col("s") == s, F.col("qd"))).alias(f"q{s}")
                for s in range(_PQ_M)
            ]
        )
    )
    adc = ((F.col("q0") + F.col("q1")) + F.col("q2")) + F.col("q3")
    w_top = W.partitionBy("query_id").orderBy(adc, "neighbor_id")
    return (
        adc0.withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w_top).cast("int"))
        .filter(F.col("rank") <= _IVFPQ_TOPK)
        .select("query_id", "neighbor_id", "cell", "adc_dist", "rank")
    )


# --------------------------------------------------------------------------
# llm_microbatch_padding — length-bucketed inference microbatches
# --------------------------------------------------------------------------

_MB_BUCKET_TOKENS = 64  # length-bucket width
_MB_BATCH = 32  # docs per microbatch
_MB_SUB_ROWS = 4096  # de-skew sub-bucket width (doc_id div)


@register(
    "llm_microbatch_padding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens, n_tokens // {_MB_BUCKET_TOKENS} AS len_bucket,
             row_number() OVER (PARTITION BY n_tokens // {_MB_BUCKET_TOKENS}
                                ORDER BY doc_id) AS rn
      FROM t
    )
    SELECT len_bucket,
           (rn - 1) // {_MB_BATCH} AS microbatch,
           COUNT(*) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_len,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_len,
           CAST(COUNT(*) * MAX(n_tokens) AS BIGINT) AS padded_tokens,
           CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS DOUBLE)
             / (COUNT(*) * MAX(n_tokens)) AS pad_waste_frac
    FROM r GROUP BY len_bucket, (rn - 1) // {_MB_BATCH}
    """,
)
def llm_microbatch_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference-side microbatching: bucket documents by length (64-token
    buckets), fill fixed-size microbatches of 32 in doc_id order, and
    audit the padding waste each batch pays to its longest member —
    the serving twin of ``llm_packing_efficiency`` (training packing).

    The per-bucket sequence number never uses a bare
    ``PARTITION BY len_bucket`` window (one task per bucket at 100 TB —
    most docs share a few buckets): local rank within
    (bucket, doc_id div 4096) sub-buckets + a tiny broadcast offset
    table, the ``llm_pack_shards`` two-phase decomposition.  Ranks are
    exact integers, so the result equals the oracle's single-window
    spelling bit-for-bit.  All compared columns are integer counts; the
    waste fraction is one double division (padded ≥ 1 always — every
    batch has ≥1 doc with ≥1 token slot; max(n_tokens) ≥ 1 because a
    split of any string yields ≥1 element).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    ).withColumn(
        "len_bucket", F.expr(f"n_tokens div {_MB_BUCKET_TOKENS}")
    ).withColumn(
        "sub", F.expr(f"doc_id div {_MB_SUB_ROWS}")
    )
    toks = cached(toks)
    from project_fauna_spark.functions.ranks import bucket_offsets

    w_local = W.partitionBy("len_bucket", "sub").orderBy("doc_id")
    local = toks.withColumn("local_rn", F.row_number().over(w_local))
    offsets = bucket_offsets(toks, ["len_bucket"], "sub", F.lit(1)).select(
        "len_bucket", "sub", "offset"
    )
    ranked = local.join(F.broadcast(offsets), ["len_bucket", "sub"]).withColumn(
        "rn", F.col("offset") + F.col("local_rn")
    )
    grouped = ranked.withColumn(
        "microbatch", F.expr(f"(rn - 1) div {_MB_BATCH}")
    ).groupBy("len_bucket", "microbatch").agg(
        F.count("*").alias("n_docs"),
        F.max("n_tokens").cast("long").alias("max_len"),
        F.sum("n_tokens").cast("long").alias("sum_len"),
    )
    padded = F.col("n_docs") * F.col("max_len")
    return grouped.select(
        "len_bucket",
        "microbatch",
        "n_docs",
        "max_len",
        "sum_len",
        padded.cast("long").alias("padded_tokens"),
        ((padded - F.col("sum_len")).cast("double") / padded).alias(
            "pad_waste_frac"
        ),
    )


# --------------------------------------------------------------------------
# event_time_to_convert — conversion latency per cohort
# --------------------------------------------------------------------------

_TTC_BUCKET_US = 86_400_000_000  # 1-day latency buckets for the two-phase rank


@register(
    "event_time_to_convert",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, fv.first_view, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      GROUP BY e.user_id, fv.first_view
    ),
    l AS (
      SELECT user_id,
             strftime(date_trunc('month', first_view), '%Y-%m') AS cohort_month,
             CAST(epoch_us(first_purchase) - epoch_us(first_view) AS DOUBLE)
               / 1000000.0 AS latency_sec
      FROM fp
    ),
    r AS (
      SELECT cohort_month, latency_sec,
             row_number() OVER (PARTITION BY cohort_month
                                ORDER BY latency_sec, user_id) AS rn,
             COUNT(*) OVER (PARTITION BY cohort_month) AS n
      FROM l
    )
    SELECT cohort_month,
           CAST(MAX(n) AS BIGINT) AS n_converted,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN latency_sec END) AS p50_sec,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN latency_sec END) AS p90_sec,
           MIN(latency_sec) AS min_sec,
           MAX(latency_sec) AS max_sec
    FROM r GROUP BY cohort_month
    """,
)
def event_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert funnel latency: per first-view cohort month, the
    distribution (exact p50/p90/min/max) of seconds between a user's
    first ``view`` and their first subsequent ``purchase``.

    Percentiles are RANK-SELECTED exact order statistics (value at
    ⌈n/2⌉ and ⌈9n/10⌉), not interpolated aggregates: the rank comes
    from the bucketed two-phase decomposition (day-granular latency
    buckets → local rank → tiny broadcast offsets), so no window is
    partitioned solely by the ~tens-of-values cohort key and no
    per-group value buffer materializes — the ``agg_approx_percentile_
    bound`` audit pattern promoted to the graded path.  Latency is one
    double division of an exact µs integer difference; cohort labels
    are formatted timestamps (TIMESTAMP_NTZ-normalized by
    ``io.load_table``).
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = fp.select(
        "user_id",
        F.date_format(F.date_trunc("month", "first_view"), "yyyy-MM").alias(
            "cohort_month"
        ),
        (
            (F.unix_micros("first_purchase") - F.unix_micros("first_view")).cast(
                "double"
            )
            / 1000000.0
        ).alias("latency_sec"),
        (F.unix_micros("first_purchase") - F.unix_micros("first_view")).alias(
            "lat_us"
        ),
    )
    lat = cached(lat)
    # Two-phase exact rank over (cohort, day-bucket) — never a window
    # partitioned by the low-cardinality cohort alone.
    bucketed = lat.withColumn("bkt", F.expr(f"lat_us div {_TTC_BUCKET_US}"))
    from project_fauna_spark.functions.ranks import bucket_offsets

    w_local = W.partitionBy("cohort_month", "bkt").orderBy("latency_sec", "user_id")
    local = bucketed.withColumn("local_rn", F.row_number().over(w_local))
    offsets = bucket_offsets(
        bucketed, ["cohort_month"], "bkt", F.lit(1), total_alias="n"
    )
    ranked = local.join(F.broadcast(offsets), ["cohort_month", "bkt"]).withColumn(
        "rn", F.col("offset") + F.col("local_rn")
    )
    return ranked.groupBy("cohort_month").agg(
        F.max("n").cast("long").alias("n_converted"),
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("latency_sec")
            )
        ).alias("p50_sec"),
        F.max(
            F.when(
                F.col("rn") == F.floor((9 * F.col("n") + 9) / 10),
                F.col("latency_sec"),
            )
        ).alias("p90_sec"),
        F.min("latency_sec").alias("min_sec"),
        F.max("latency_sec").alias("max_sec"),
    )


# --------------------------------------------------------------------------
# layout_deletion_vector_stats — merge-on-read DV audit
# --------------------------------------------------------------------------


@register(
    "layout_deletion_vector_stats",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS part_month,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_deleted,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
             / COUNT(*) AS dv_density,
           CASE WHEN COUNT(*) FILTER (WHERE o_orderstatus <> 'F') > 0
                THEN CAST(COUNT(*) AS DOUBLE)
                     / COUNT(*) FILTER (WHERE o_orderstatus <> 'F') END
             AS read_amplification,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') * 10 > COUNT(*) * 3
             AS rewrite_recommended
    FROM orders GROUP BY 1
    """,
)
def layout_deletion_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletion-vector audit (the Delta/Iceberg DV
    pattern): per month partition, how much of the data is soft-deleted
    (here: status 'F' rows stand in for DV-marked rows), the read
    amplification a merge-on-read scan pays (rows scanned per live row
    returned), and whether compaction should rewrite the partition
    (density > 30% — an INTEGER cross-multiplication, no float
    threshold at the compared edge).

    One map-combined conditional aggregate per partition — the nightly
    lakehouse-maintenance planner shape; pairs with
    ``layout_compaction_plan`` (small-file planning) and
    ``cdc_tombstone_compaction`` (logical deletes).
    """
    o = load_table(spark, sf_dir, "orders")
    deleted = (F.col("o_orderstatus") == "F").cast("long")
    agg = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "part_month"
        )
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(deleted).cast("long").alias("n_deleted"),
    )
    live = F.col("n_rows") - F.col("n_deleted")
    return agg.select(
        "part_month",
        "n_rows",
        "n_deleted",
        (F.col("n_deleted").cast("double") / F.col("n_rows")).alias("dv_density"),
        F.when(live > 0, F.col("n_rows").cast("double") / live).alias(
            "read_amplification"
        ),
        (F.col("n_deleted") * 10 > F.col("n_rows") * 3).alias(
            "rewrite_recommended"
        ),
    )


# --------------------------------------------------------------------------
# llm_span_corruption_plan — T5/UL2 denoising-objective accounting
# --------------------------------------------------------------------------


@register(
    "llm_span_corruption_plan",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    p AS (
      SELECT doc_id, lang, n_tokens,
             (n_tokens * 15) // 100 AS n_corrupt
      FROM t
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_corrupt AS BIGINT) AS n_corrupt,
           CAST(CASE WHEN n_corrupt > 0 THEN (n_corrupt + 2) // 3
                     ELSE 0 END AS BIGINT) AS n_spans,
           CAST(n_tokens - n_corrupt
                + CASE WHEN n_corrupt > 0 THEN (n_corrupt + 2) // 3 ELSE 0 END
                AS BIGINT) AS input_len,
           CAST(CASE WHEN n_corrupt > 0
                     THEN n_corrupt + (n_corrupt + 2) // 3 + 1
                     ELSE 0 END AS BIGINT) AS target_len
    FROM p
    """,
)
def llm_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning: per document, the corruption
    budget (15% of tokens), the span count (mean span length 3 →
    ⌈budget/3⌉ sentinels), and the resulting encoder/decoder sequence
    lengths (inputs keep uncorrupted tokens + one sentinel per span;
    targets carry corrupted tokens + sentinels + EOS).

    Pure integer arithmetic end-to-end — ``(n*15) div 100`` instead of
    ``floor(0.15*n)`` so neither engine evaluates an inexact binary
    fraction; a narrow map with no shuffle at all (the aggregate view
    is a follow-on groupBy for whoever needs corpus totals).  This is
    the sizing pass a denoising-objective data pipeline runs before
    packing (``llm_pack_shards`` consumes input_len downstream).
    """
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " ")).cast("long")
    plan = d.select("doc_id", "lang", n.alias("n_tokens")).withColumn(
        "n_corrupt", F.expr("(n_tokens * 15) div 100")
    )
    n_spans = F.when(
        F.col("n_corrupt") > 0, F.expr("(n_corrupt + 2) div 3")
    ).otherwise(F.lit(0).cast("long"))
    return plan.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_corrupt",
        n_spans.alias("n_spans"),
        (F.col("n_tokens") - F.col("n_corrupt") + n_spans).alias("input_len"),
        F.when(
            F.col("n_corrupt") > 0,
            F.col("n_corrupt") + n_spans + F.lit(1),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("target_len"),
    )


# --------------------------------------------------------------------------
# ml_chi2_term_selection — chi-square term↔language association
# --------------------------------------------------------------------------

_CHI2_TOP_TERMS = 50


@register(
    "ml_chi2_term_selection",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    df_t AS (
      SELECT term, COUNT(*) AS df FROM toks GROUP BY term
      ORDER BY df DESC, term LIMIT {_CHI2_TOP_TERMS}
    ),
    nl AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
    tot AS (SELECT COUNT(*) AS n FROM documents),
    a_cnt AS (
      SELECT toks.term, toks.lang, COUNT(*) AS a
      FROM toks JOIN df_t ON df_t.term = toks.term
      GROUP BY toks.term, toks.lang
    ),
    cells AS (
      SELECT df_t.term, nl.lang, df_t.df, nl.n_lang, tot.n,
             COALESCE(a_cnt.a, 0) AS a
      FROM df_t CROSS JOIN nl CROSS JOIN tot
      LEFT JOIN a_cnt ON a_cnt.term = df_t.term AND a_cnt.lang = nl.lang
    )
    SELECT term, lang,
           CAST(a AS BIGINT) AS n_docs_with_term,
           CAST(df AS BIGINT) AS term_df,
           CASE WHEN n_lang < n AND df < n THEN
             (CAST(n AS DOUBLE)
              * (CAST(a * (n - n_lang - (df - a)) - (n_lang - a) * (df - a)
                      AS DOUBLE)
                 / CAST(n_lang * (n - n_lang) AS DOUBLE)))
             * (CAST(a * (n - n_lang - (df - a)) - (n_lang - a) * (df - a)
                     AS DOUBLE)
                / CAST(df * (n - df) AS DOUBLE))
           END AS chi2
    FROM cells
    """,
)
def ml_chi2_term_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature selection: for the 50 highest-df terms, the
    χ² statistic of the term↔language 2×2 contingency table (one-vs-
    rest per language) — the classic log-free corpus-contrast /
    classifier-feature ranking (scikit-learn ``chi2`` semantics for
    binary presence features).

    χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) is evaluated as the
    fixed-association form N·(Δ/(row margins))·(Δ/(col margins)) in
    BOTH engines: every operand is an exact integer below 2⁵³ (margins
    ≤ N², Δ ≤ N²) so the two IEEE divisions and two multiplications
    are bit-identical — the decimal route is unnecessary because no
    value ever exceeds double precision.  Degenerate single-language
    corpora yield NULL (guarded), never 0/0.

    Scale: per-doc distinct terms explode once; the top-50 cut is a
    TakeOrdered (no full vocab sort); a-counts join the tiny term list
    broadcast-side; the language and total margins are broadcast
    1-row/N-row dims.  Output is |terms| × |languages| rows.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("term"),
    )
    toks = cached(toks)
    df_t = (
        toks.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(_CHI2_TOP_TERMS)
    )
    nl = d.groupBy("lang").agg(F.count("*").alias("n_lang"))
    tot = d.agg(F.count("*").alias("n"))
    a_cnt = (
        toks.join(F.broadcast(df_t.select("term")), "term")
        .groupBy("term", "lang")
        .agg(F.count("*").alias("a"))
    )
    cells = (
        df_t.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(tot))
        .join(a_cnt, ["term", "lang"], "left")
        .withColumn("a", F.coalesce(F.col("a"), F.lit(0)))
    )
    # Fixed-association χ²: Δ = a·d − b·c with b = n_lang − a,
    # c = df − a, d = n − n_lang − c; margins (a+b)(c+d) = n_lang·(n −
    # n_lang) and (a+c)(b+d) = df·(n − df).
    delta = (
        F.col("a") * (F.col("n") - F.col("n_lang") - (F.col("df") - F.col("a")))
        - (F.col("n_lang") - F.col("a")) * (F.col("df") - F.col("a"))
    ).cast("double")
    den_rows = (F.col("n_lang") * (F.col("n") - F.col("n_lang"))).cast("double")
    den_cols = (F.col("df") * (F.col("n") - F.col("df"))).cast("double")
    chi2 = (F.col("n").cast("double") * (delta / den_rows)) * (delta / den_cols)
    return cells.select(
        "term",
        "lang",
        F.col("a").cast("long").alias("n_docs_with_term"),
        F.col("df").cast("long").alias("term_df"),
        # Both margins guarded: a degenerate single-language corpus
        # (n_lang = n) OR an every-document term (df = n) zeroes a
        # denominator — ANSI Spark throws on 0/0 where DuckDB NULLs
        # (code-review r6), so NULL the cell explicitly in both.
        F.when(
            (F.col("n_lang") < F.col("n")) & (F.col("df") < F.col("n")), chi2
        ).alias("chi2"),
    )
