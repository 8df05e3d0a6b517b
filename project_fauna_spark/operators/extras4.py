"""Round-4 operator batch: corpus-curation lifecycle completions.

Nine operators a production training-data pipeline runs on top of the
primitives the repo already has — cluster canonicalization, incremental
ingest dedup, packing audits, graded decontamination, normalization-tier
dedup, embedding-space class separability, funnel reporting,
semi-structured drift audits, and leakage-safe feature snapshots:

* ``dedup_cluster_representative`` — near-dup components → ONE
  canonical document per cluster (longest text, min-id tie-break).
* ``dedup_incremental_base_vs_new`` — a new ingest batch checked
  against the existing corpus by content digest (the nightly-drop
  shape: never re-dedup the base).
* ``llm_packing_efficiency`` — per-shard fill/waste audit over the
  greedy token packing (is the 2048 budget actually utilized?).
* ``llm_contamination_overlap`` — graded n-gram contamination score
  per document against a held-out eval set (the decontamination
  DIAL, where ``llm_decontaminate`` is the binary gate).
* ``text_normalized_collisions`` — casefold/punctuation-normalized
  duplicate groups: the dedup tier between byte-exact and fuzzy.
* ``sim_centroid_confusion`` — pairwise cosine between label
  centroids: which classes are entangled in embedding space.
* ``llm_dedup_survivorship_report`` — one-row dedup funnel: corpus →
  exact → fingerprint → near-dup survivor counts.
* ``dq_props_key_profile`` — JSON-key drift audit over semi-structured
  event payloads (new producer fields surface by first_day).
* ``ml_training_snapshot_asof`` — per-anchor point-in-time features
  strictly from pre-anchor events (the feature-store leakage guard).

Scale design (100 TB):

* Cluster canonicalization is one bounded window over components
  (component sizes are near-dup cluster sizes — small by construction).
* Incremental dedup shuffles 16-byte digests, never text; the
  within-batch check is a window over digest groups.  In production
  the base digest table is bucketed on digest → exchange-free join.
* Packing audit aggregates the (already de-skewed) shard assignment —
  keyspace-sized output per (lang, shard).
* Contamination: eval-set grams are corpus-fraction-tiny → broadcast;
  the per-doc count is one map-combined aggregate after the explode.
* Normalization dedup groups by a 16-byte digest of the normalized
  text (shuffle carries digests + ids).
* Centroid confusion reuses the two-level fixed-order fold (bounded
  per-group state) and cross-joins only the |labels|-row centroid
  table (broadcast by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.functions.shingles import shingles
from project_fauna_spark.io import load_table
from project_fauna_spark.operators._oracle_shared import (
    SQL_CC_COMPONENTS,
    SQL_COS,
    SQL_RARE_SHINGLES as _SQL_RARE_SHINGLES,
    SQL_SHINGLES as _SQL_SHINGLES,
)
from project_fauna_spark.plans.registry import register

# NOTE: cross-operator imports (dedup_connected_components,
# llm_pack_shards) happen lazily inside the query bodies — a
# module-level import from another *registering* module creates an
# import cycle through plans/__init__ and perturbs registry order
# (memory: grading window = import order).  Oracle SQL is composed from
# the shared non-registering constants instead.

# The CC oracle is reused verbatim as a subquery (DuckDB allows WITH —
# including WITH RECURSIVE — inside a FROM subquery), so representative
# selection grades against the exact same component structure the Spark
# side consumes.
_CC_SQL = SQL_CC_COMPONENTS


@register(
    "dedup_cluster_representative",
    oracle=f"""
    WITH cc AS (SELECT * FROM ({_CC_SQL}) _cc),
    scored AS (
      SELECT cc.component_id, cc.n_members, d.doc_id, length(d.text) AS n_chars,
             row_number() OVER (PARTITION BY cc.component_id
                                ORDER BY length(d.text) DESC, d.doc_id) AS rk
      FROM cc JOIN documents d ON d.doc_id = cc.doc_id
    )
    SELECT component_id, CAST(n_members AS BIGINT) AS n_members,
           doc_id AS rep_doc_id, CAST(n_chars AS BIGINT) AS rep_n_chars
    FROM scored WHERE rk = 1
    """,
)
def dedup_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document per near-dup cluster: from the connected
    components of the near-dup graph, keep the longest text (min
    doc_id on ties) as each cluster's representative — the step that
    turns pairwise dedup output into an actual keep/drop decision.

    One row_number window partitioned by component; state is bounded
    by cluster size (near-dup clusters are small by construction — a
    mega-cluster means the upstream threshold is wrong, not the plan).
    """
    from project_fauna_spark.operators.dedup import dedup_connected_components

    cc = dedup_connected_components(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.length("text").alias("n_chars"))
    w = W.partitionBy("component_id").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        cc.join(d, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "component_id",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").cast("long").alias("rep_n_chars"),
        )
    )


@register(
    "dedup_incremental_base_vs_new",
    oracle="""
    WITH digests AS (
      SELECT doc_id, md5(text) AS dg, doc_id % 10 = 0 AS is_new FROM documents
    ),
    base AS (SELECT DISTINCT dg FROM digests WHERE NOT is_new),
    new_batch AS (
      SELECT doc_id, dg,
             MIN(doc_id) OVER (PARTITION BY dg) AS first_new
      FROM digests WHERE is_new
    )
    SELECT n.doc_id,
           (n.dg IN (SELECT dg FROM base)) AS is_dup_of_base,
           (n.first_new < n.doc_id) AS is_dup_within_new
    FROM new_batch n
    """,
)
def dedup_incremental_base_vs_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a new document batch (here: doc_id
    divisible by 10) is checked against the already-ingested corpus by
    content digest, plus within-batch first-copy detection — the
    nightly-drop pattern that never re-deduplicates the base corpus.

    The shuffle carries (digest, id) pairs only — never text.  The
    base side joins on digest; in production the base digest table is
    bucketed on digest so the check is exchange-free on the big side.
    The within-batch check is a MIN window over digest groups (group
    size = copies of one payload — bounded).
    """
    d = load_table(spark, sf_dir, "documents")
    digests = d.select(
        "doc_id",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("dg"),
        (F.col("doc_id") % 10 == 0).alias("is_new"),
    )
    base = digests.filter(~F.col("is_new")).select("dg").distinct()
    new_batch = digests.filter(F.col("is_new")).withColumn(
        "first_new", F.min("doc_id").over(W.partitionBy("dg"))
    )
    hit = base.select("dg", F.lit(True).alias("_in_base"))
    return (
        new_batch.join(hit, "dg", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_in_base"), F.lit(False)).alias("is_dup_of_base"),
            (F.col("first_new") < F.col("doc_id")).alias("is_dup_within_new"),
        )
    )


@register(
    "llm_packing_efficiency",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / 2048) AS BIGINT) AS shard_id
      FROM toks
    ),
    shards AS (
      SELECT lang, shard_id,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_used
      FROM packed GROUP BY lang, shard_id
    )
    SELECT lang, shard_id, n_docs, tokens_used,
           CAST(tokens_used AS DOUBLE) / 2048 AS fill_ratio,
           shard_id = MAX(shard_id) OVER (PARTITION BY lang) AS is_final_shard
    FROM shards
    """,
)
def llm_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-packing audit: per (lang, shard) document count, token
    fill, fill ratio against the 2048 budget, and final-shard flag —
    the utilization report that tells you whether greedy packing is
    wasting training tokens.

    Reuses ``llm_pack_shards``'s de-skewed decomposed cumsum (no
    whole-language single-task window), then one keyspace-sized
    aggregate; the final-shard flag is a window over the tiny shard
    table.  fill_ratio is one double division of exact integers.
    """
    from project_fauna_spark.operators.llm_pipeline import llm_pack_shards

    pack = llm_pack_shards(spark, sf_dir)
    shards = pack.groupBy("lang", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_used"),
    )
    return shards.select(
        "lang",
        "shard_id",
        "n_docs",
        "tokens_used",
        (F.col("tokens_used").cast("double") / 2048).alias("fill_ratio"),
        (F.col("shard_id") == F.max("shard_id").over(W.partitionBy("lang"))).alias(
            "is_final_shard"
        ),
    )


@register(
    "llm_contamination_overlap",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    evalg AS (
      SELECT DISTINCT g FROM (SELECT doc_id, unnest(sgl) AS g FROM sh)
      WHERE doc_id % 97 = 0
    ),
    train AS (SELECT doc_id, sgl FROM sh WHERE doc_id % 97 <> 0),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_overlap
      FROM (SELECT doc_id, unnest(sgl) AS g FROM train) t
      JOIN evalg USING (g)
      GROUP BY t.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.sgl) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / len(t.sgl) AS overlap_frac
    FROM train t LEFT JOIN hits h ON h.doc_id = t.doc_id
    WHERE len(t.sgl) > 0
    """,
)
def llm_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded eval-set contamination: for every training document, the
    fraction of its distinct word 3-grams that appear anywhere in the
    held-out eval slice (doc_id ≡ 0 mod 97) — the dial behind the
    binary ``llm_decontaminate`` gate (report, threshold, or weight
    instead of drop).

    Eval-side grams are corpus-fraction-tiny (the eval set is fixed
    while the corpus grows) → broadcast hash join against the exploded
    training grams; the per-doc overlap count is map-combinable.  The
    score is one double division of two exact integers.
    """
    from project_fauna_spark.cache import cached

    # The shingled frame feeds THREE branches (eval grams, the exploded
    # train side, the per-doc sizes) — recompute costs 3 scans + 3
    # shingle passes; persisting is a measured 6× win at sf0.1
    # (2.0 s → 0.3 s, A/B'd 2026-08-14).
    d = cached(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", shingles(F.col("text")).alias("sgl")
        )
    )
    is_eval = F.col("doc_id") % 97 == 0
    evalg = (
        d.filter(is_eval)
        .select(F.explode("sgl").alias("g"))
        .distinct()
    )
    train = d.filter(~is_eval).select("doc_id", "sgl", F.size("sgl").alias("n_grams"))
    hits = (
        train.select("doc_id", F.explode("sgl").alias("g"))
        .join(F.broadcast(evalg), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        train.filter(F.col("n_grams") > 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / F.col("n_grams")
            ).alias("overlap_frac"),
        )
    )


@register(
    "text_normalized_collisions",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             array_to_string(list_sort(list_distinct(string_split(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')), ' '))), ' ') AS ntext
      FROM documents
    )
    SELECT md5(ntext) AS norm_digest,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keep_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM norm GROUP BY md5(ntext) HAVING COUNT(*) >= 2
    """,
)
def text_normalized_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-normalized duplicate groups (the OpenRefine
    "fingerprint" method): casefold, strip punctuation, squeeze
    whitespace, then collapse to the SORTED set of distinct words —
    word-order-insensitive, so reshuffled/lightly-edited copies land in
    one group.  The dedup tier between byte-exact (misses trivial
    edits) and n-gram fuzzy (a join); this is one aggregate.

    The shuffle key is the 16-byte md5 of the fingerprint, so group-by
    traffic carries digests + ids, never documents.  ASCII corpus ⇒
    lower/regex/sort agree across engines (binary string order; Java
    and RE2 treat these character classes identically).
    """
    d = load_table(spark, sf_dir, "documents")
    squeezed = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    ntext = F.array_join(F.array_sort(F.array_distinct(F.split(squeezed, " "))), " ")
    return (
        d.select("doc_id", F.md5(F.encode(ntext, "UTF-8")).alias("norm_digest"))
        .groupBy("norm_digest")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "sim_centroid_confusion",
    oracle=f"""
    WITH x AS (
      SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    c AS (
      SELECT label, dim,
             CAST(CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS m
      FROM x GROUP BY label, dim
    ),
    cent AS (
      SELECT label, list(m ORDER BY dim) AS centroid FROM c GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           {SQL_COS.format(a='a.centroid', b='b.centroid')} AS cos_centroids
    FROM cent a JOIN cent b ON a.label < b.label
    """,
)
def sim_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between label centroids — the embedding-space
    class-separability audit (entangled labels ⇒ noisy training signal
    or a collapsed embedding model).

    Per-dimension centroid means come from ONE posexplode pass with
    decimal-accumulated sums (order-independent, VARCHAR-routed in the
    oracle per the repo's float-parity convention); centroid arrays
    are assembled dim-ordered, so both engines hold bit-identical
    vectors before the index-ordered cosine folds.  The pairwise stage
    cross-joins only the |labels|-row centroid table — broadcast-sized
    by construction at any corpus scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "dim", "v"
        ),
    )
    c = x.groupBy("label", "dim").agg(
        (F.sum(F.col("v").cast("decimal(30,12)")).cast("double") / F.count("v")).alias("m")
    )
    cent = c.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s.m
        ).alias("centroid")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
        )

    a = cent.select(F.col("label").alias("label_a"), F.col("centroid").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("centroid").alias("cb"))
    ca, cb = F.col("ca"), F.col("cb")
    cos = _dot(ca, cb) / F.sqrt(
        _dot(ca, ca) * _dot(cb, cb)
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", cos.alias("cos_centroids"))
    )


@register(
    "llm_dedup_survivorship_report",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, text,
             array_to_string(list_sort(list_distinct(string_split(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')), ' '))), ' ') AS fprint
      FROM documents
    ),
    exact_kept AS (
      SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
      FROM fp GROUP BY text
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(ws[i:i+2], ' ')
                            for i in range(1, len(ws) - 1)]) AS sgl
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM exact_kept)
    ),
    {_SQL_RARE_SHINGLES},
    neardup_b AS (
      SELECT DISTINCT b.doc_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      JOIN rare ar ON ar.doc_id = a.doc_id
      JOIN rare br ON br.doc_id = b.doc_id
      WHERE len(list_intersect(ar.rsgl, br.rsgl)) > 0
        AND CAST(len(list_intersect(ar.rsgl, br.rsgl)) AS DOUBLE)
            / (len(a.sgl) + len(b.sgl) - len(list_intersect(ar.rsgl, br.rsgl))) >= 0.5
    )
    SELECT (SELECT COUNT(*) FROM documents) AS n_total,
           (SELECT COUNT(*) FROM exact_kept) AS n_after_exact,
           (SELECT COUNT(DISTINCT fprint) FROM fp) AS n_distinct_fingerprints,
           (SELECT COUNT(*) FROM exact_kept)
             - (SELECT COUNT(*) FROM neardup_b) AS n_after_neardup
    """,
)
def llm_dedup_survivorship_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup funnel report: corpus size → after byte-exact dedup →
    distinct OpenRefine fingerprints → after greedy near-dup removal —
    the one-row survivorship summary every corpus drop ships with (how
    much did each dedup tier actually remove?).

    Each tier reuses the scale-safe primitive shapes: exact = one hash
    aggregate, fingerprints = one aggregate on a 16-byte digest, near-
    dup = the df-capped candidate join over exact survivors.  The four
    counts reduce to single scalars — output is one row regardless of
    corpus size.
    """
    from project_fauna_spark.functions.shingles import (
        drop_hot_shingles,
        shingle_hashes,
    )

    d = load_table(spark, sf_dir, "documents")
    squeezed = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    fprint = F.array_join(F.array_sort(F.array_distinct(F.split(squeezed, " "))), " ")
    fp = d.select("doc_id", "text", fprint.alias("fprint"))

    # Single consumer (the near-dup pipeline below) — the scalar
    # n_after_exact is derived arithmetically instead (COUNT(*) of
    # GROUP BY text == COUNT(DISTINCT text), NULL group spelled
    # explicitly), so the r12 corpus-text-sized cached() pin is gone.
    # Under cached-plan AQE that pin coalesced to a handful of
    # partitions and serialized the downstream shingle self-join
    # (measured +1.4 s, OPTIMIZATION_r13.md); at 100 TB it was a
    # corpus-sized MEMORY_AND_DISK materialization.
    exact_kept = fp.groupBy("text").agg(F.min("doc_id").alias("doc_id"))

    hashed = exact_kept.select("doc_id", shingle_hashes(F.col("text")).alias("hsgl"))
    # Pin moved from exact_kept (corpus TEXT) to the exploded shingle
    # index (three int64 columns).  ex has THREE consumers — the hot-df
    # aggregate inside drop_hot_shingles plus both self-join sides — so
    # this is the node where one pin caps the expensive fingerprint+
    # shingle build at exactly one pass, at full post-exchange
    # parallelism, instead of per consumer on an AQE-coalesced text pin
    # (r13; guide §5).  The downstream anti-join is a broadcast
    # (map-side) pass over the pin, cheap to run per consumer.
    from project_fauna_spark.cache import cached

    ex = cached(
        hashed.select("doc_id", F.size("hsgl").alias("n"), F.explode("hsgl").alias("h"))
    )
    exr = drop_hot_shingles(ex)
    a, b = exr.alias("a"), exr.alias("b")
    # Length-ratio prune (result-preserving): n_inter <= min(n_a, n_b),
    # so jaccard >= 0.5 forces n_a <= 2*n_b AND n_b <= 2*n_a (violate
    # either strictly and the ratio is < 0.5 strictly; equality can
    # reach exactly 0.5, so the bounds are inclusive).  Filtering in
    # the join condition drops those pairs before the pair aggregation
    # — fewer shuffled bytes, ~20% off the candidate stage (guide §2.3;
    # measured A/B in OPTIMIZATION_r13.md, identical n_nd).
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") <= 2 * F.col("b.n"))
            & (F.col("b.n") <= 2 * F.col("a.n")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
        .filter(
            F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= 0.5
        )
    )
    n_dropped = cand.select(F.col("doc_b").alias("doc_id")).distinct().agg(
        F.count("*").alias("n_nd")
    )
    # The corpus scalars stay SEPARATE single-distinct aggregates
    # (crossJoined): n_after_exact == COUNT(*) of GROUP BY text ==
    # COUNT(DISTINCT text) plus one for a NULL-text group if present
    # (exact int64 identity — DuckDB's COUNT(DISTINCT) skips NULLs, the
    # GROUP BY keeps them).  A combined two-distinct aggregate plans an
    # Expand ×3 of the text column and measured 40% slower than the
    # three pruned scans (0.65 vs 0.47 s, OPTIMIZATION_r13.md).
    totals = d.agg(F.count(F.lit(1)).alias("n_total"))
    n_exact = d.agg(
        (
            F.countDistinct("text")
            + (F.count(F.lit(1)) > F.count("text")).cast("long")
        ).alias("n_after_exact")
    )
    n_fp = fp.agg(F.countDistinct("fprint").alias("n_distinct_fingerprints"))
    return (
        totals.crossJoin(n_exact)
        .crossJoin(n_fp)
        .crossJoin(n_dropped)
        .select(
            "n_total",
            "n_after_exact",
            "n_distinct_fingerprints",
            (F.col("n_after_exact") - F.col("n_nd")).alias("n_after_neardup"),
        )
    )


@register(
    "dq_props_key_profile",
    oracle="""
    WITH keyed AS (
      SELECT e.event_id, CAST(e.ts AS DATE) AS day, unnest(json_keys(e.props)) AS key
      FROM events e WHERE e.props IS NOT NULL
    )
    SELECT key,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
           strftime(MIN(day), '%Y-%m-%d') AS first_day,
           strftime(MAX(day), '%Y-%m-%d') AS last_day
    FROM keyed GROUP BY key
    """,
)
def dq_props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema-drift audit: profile every JSON key that
    appears in the ``events.props`` payload — event coverage, active
    days, first/last sighting.  A key whose ``first_day`` is recent is
    a producer-side schema change the warehouse hasn't modeled yet.

    ``json_object_keys`` is expression-level (JVM JSON parser, no
    Python); the explode fans out by keys-per-payload (bounded) and
    the profile is one map-combined aggregate keyed by key name.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    keyed = e.select(
        F.col("ts").cast("date").alias("day"),
        F.explode(F.json_object_keys("props")).alias("key"),
    )
    return keyed.groupBy("key").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("day").cast("long").alias("n_days"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
    )


@register(
    "ml_training_snapshot_asof",
    oracle="""
    WITH anchors AS (
      SELECT event_id AS anchor_id, user_id, ts AS anchor_ts, value AS label
      FROM events WHERE event_type = 'purchase'
    ),
    hist AS (
      SELECT a.anchor_id, e.event_type, e.ts, e.event_id, e.value
      FROM anchors a JOIN events e
        ON e.user_id = a.user_id
       AND e.ts < a.anchor_ts
       AND e.ts >= a.anchor_ts - INTERVAL 7 DAY
    ),
    feats AS (
      SELECT anchor_id,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_views_7d,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clicks_7d,
             COUNT(*) AS n_events_7d,
             MAX(struct_pack(t := ts, i := event_id, v := value)) AS last_ev
      FROM hist GROUP BY anchor_id
    )
    SELECT a.anchor_id, a.user_id, a.label,
           COALESCE(f.n_views_7d, 0) AS n_views_7d,
           COALESCE(f.n_clicks_7d, 0) AS n_clicks_7d,
           COALESCE(f.n_events_7d, 0) AS n_events_7d,
           f.last_ev.v AS last_value_before
    FROM anchors a LEFT JOIN feats f ON f.anchor_id = a.anchor_id
    """,
)
def ml_training_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe training-example builder: for every purchase
    (anchor), per-user features computed STRICTLY from events before
    the anchor timestamp within a 7-day window — the point-in-time
    join feature stores exist to get right (using post-anchor events
    would leak the future into training).

    The history join is equi on user_id with the time band as a
    residual; features are one map-combined aggregate per anchor.
    ``last_value_before`` uses a struct max over (ts, event_id, value)
    — (ts, event_id) is unique, so the argmax is deterministic and
    engine-identical.
    """
    e = load_table(spark, sf_dir, "events")
    anchors = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("ts").alias("anchor_ts"),
        F.col("value").alias("label"),
    )
    hist = anchors.join(
        e.select(
            F.col("user_id").alias("h_user"),
            F.col("event_type").alias("h_type"),
            F.col("ts").alias("h_ts"),
            F.col("event_id").alias("h_id"),
            F.col("value").alias("h_value"),
        ),
        (F.col("h_user") == F.col("user_id"))
        & (F.col("h_ts") < F.col("anchor_ts"))
        & (F.col("h_ts") >= F.col("anchor_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    feats = hist.groupBy("anchor_id").agg(
        F.sum(F.when(F.col("h_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("n_views_7d"),
        F.sum(F.when(F.col("h_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_clicks_7d"),
        F.count("*").alias("n_events_7d"),
        F.max(F.struct(F.col("h_ts"), F.col("h_id"), F.col("h_value").alias("v"))).alias(
            "last_ev"
        ),
    )
    return (
        anchors.join(feats, "anchor_id", "left")
        .select(
            "anchor_id",
            "user_id",
            "label",
            F.coalesce("n_views_7d", F.lit(0)).alias("n_views_7d"),
            F.coalesce("n_clicks_7d", F.lit(0)).alias("n_clicks_7d"),
            F.coalesce("n_events_7d", F.lit(0)).alias("n_events_7d"),
            F.col("last_ev.v").alias("last_value_before"),
        )
    )


_FD_CANDIDATES = [
    # (table, determinant, dependent) — candidate FDs a profiler would test
    ("nation", "n_nationkey", "n_regionkey"),
    ("customer", "c_custkey", "c_nationkey"),
    ("orders", "o_orderkey", "o_orderpriority"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
]


@register(
    "dq_functional_dependencies",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{t}' AS table_name, '{det}' AS determinant, '{dep}' AS dependent,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_violating_keys,
           COUNT(*) FILTER (WHERE nd > 1) = 0 AS holds
    FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd FROM {t} GROUP BY {det})
    """
        for t, det, dep in _FD_CANDIDATES
    ),
)
def dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs: for
    each (determinant → dependent) hypothesis, count determinant values
    that map to more than one dependent value.  ``holds = true`` means
    the FD is valid on this data — the schema-inference signal behind
    normalization advice, join-key validation, and dimension modeling.

    One map-combined two-level aggregate per candidate pair (group by
    determinant, then reduce to three scalars), unioned keyspace-sized
    rows.  A production profiler runs the same shape over the full
    candidate lattice with pruning; the fixed list keeps this
    oracle-exact.
    """
    out = None
    for t, det, dep in _FD_CANDIDATES:
        tbl = load_table(spark, sf_dir, t)
        per_key = tbl.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        row = per_key.agg(
            F.lit(t).alias("table_name"),
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            F.count("*").alias("n_keys"),
            F.count(F.when(F.col("nd") > 1, 1)).alias("n_violating_keys"),
            (F.count(F.when(F.col("nd") > 1, 1)) == 0).alias("holds"),
        )
        out = row if out is None else out.unionAll(row)
    return out


_SEQ_BUCKETS = [0, 64, 128, 256, 512, 1024]  # left edges; last is open-ended


def _bucket_case_sql() -> str:
    parts = []
    for i, lo in enumerate(_SEQ_BUCKETS):
        hi = _SEQ_BUCKETS[i + 1] if i + 1 < len(_SEQ_BUCKETS) else None
        cond = f"n_tokens < {hi}" if hi is not None else "TRUE"
        label = f"[{lo},{hi})" if hi is not None else f"[{lo},inf)"
        parts.append(f"WHEN {cond} THEN {i}")
        parts.append(f"-- {label}")
    return "CASE " + " ".join(p for p in parts if not p.startswith("--")) + " END"


@register(
    "llm_seq_len_histogram",
    oracle=f"""
    WITH toks AS (
      SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    b AS (
      SELECT lang, {_bucket_case_sql()} AS bucket_ord, COUNT(*) AS n_docs
      FROM toks GROUP BY 1, 2
    ),
    t AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS total FROM b GROUP BY lang)
    SELECT b.lang, CAST(b.bucket_ord AS INT) AS bucket_ord,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(CAST(SUM(b.n_docs) OVER (PARTITION BY b.lang ORDER BY b.bucket_ord
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
             / t.total AS cum_share
    FROM b JOIN t ON t.lang = b.lang
    """,
)
def llm_seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram per language: power-of-two token-count
    buckets with cumulative share — the audit behind choosing a training
    context length (what fraction of the corpus fits in 256 tokens?).

    Bucketing is an explicit CASE ladder (NOT floor(log2(n)) — libm at
    exact powers of two is the one place engines may disagree on the
    floor edge); one map-combined aggregate to |langs|·|buckets| rows,
    then a keyspace-sized window for the cumulative share — one double
    division per row of two exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    bucket = F.lit(len(_SEQ_BUCKETS) - 1)
    for i in range(len(_SEQ_BUCKETS) - 2, -1, -1):
        bucket = F.when(
            F.col("n_tokens") < _SEQ_BUCKETS[i + 1], F.lit(i)
        ).otherwise(bucket)
    b = toks.groupBy("lang", bucket.cast("int").alias("bucket_ord")).agg(
        F.count("*").alias("n_docs")
    )
    t = b.groupBy(F.col("lang").alias("t_lang")).agg(
        F.sum("n_docs").cast("long").alias("total")
    )
    w = (
        W.partitionBy("lang")
        .orderBy("bucket_ord")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        b.join(F.broadcast(t), b.lang == F.col("t_lang"))
        .select(
            "lang",
            "bucket_ord",
            F.col("n_docs").cast("long").alias("n_docs"),
            (
                F.sum("n_docs").over(w).cast("long").cast("double") / F.col("total")
            ).alias("cum_share"),
        )
    )


@register(
    "q_percentile_bands_daily",
    oracle="""
    SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95
    FROM events GROUP BY event_type, CAST(ts AS DATE)
    """,
)
def q_percentile_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily P50/P95 bands per event type — the latency/value dashboard
    aggregation (exact PERCENTILE_CONT over each (type, day) group).

    One shuffle on the composite key; exact percentiles sort each
    group's values (group size = events/type/day — bounded); at 100 TB
    swap in percentile_approx (t-digest, map-combinable) when the
    contract allows, as ``semi_percentile_approx`` demonstrates.
    Interpolation parity with quantile_cont is pinned by
    ``agg_percentile_exact``.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr("percentile(value, 0.5D)").alias("p50"),
            F.expr("percentile(value, 0.95D)").alias("p95"),
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_events",
            "p50",
            "p95",
        )
    )


# Recall audit composes the two dedup oracles verbatim — candidate
# generation (MinHash band collisions) scored against the exact
# df-capped Jaccard ground truth.  Both oracle strings are WITH-queries
# (DuckDB accepts them as FROM-subqueries) and live in OTHER modules, so
# the oracle is built via oracle_builder AFTER the whole registry loads
# — registration order is the rotating grading window and can never be
# relied on for cross-oracle references.


def _recall_audit_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    exact_sql = ORACLE["dedup_ngram_jaccard"]
    mh_sql = ORACLE["dedup_minhash_md5"]
    return f"""
    WITH exact_pairs AS (SELECT doc_a, doc_b FROM ({exact_sql}) x),
    cand_pairs AS (SELECT DISTINCT doc_a, doc_b FROM ({mh_sql}) m)
    SELECT (SELECT COUNT(*) FROM exact_pairs) AS n_exact,
           (SELECT COUNT(*) FROM cand_pairs) AS n_candidates,
           (SELECT COUNT(*) FROM exact_pairs e
             JOIN cand_pairs c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
             AS n_exact_found,
           CASE WHEN (SELECT COUNT(*) FROM exact_pairs) > 0
                THEN CAST((SELECT COUNT(*) FROM exact_pairs e
                            JOIN cand_pairs c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
                          AS DOUBLE)
                     / (SELECT COUNT(*) FROM exact_pairs)
                ELSE NULL END AS recall
    """


@register(
    "dedup_minhash_recall_audit",
    oracle_builder=_recall_audit_oracle,
)
def dedup_minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH tuning audit: what fraction of the exact near-dup pairs does
    the MinHash band index actually surface as candidates?  This is the
    measurement loop behind choosing (n_perm, band_size) — run it on a
    sample whenever the corpus distribution shifts; recall < target
    means more bands (or the exact tier) are needed.

    Reuses both production plans via lazy imports (no import cycle):
    the exact side is the df-capped Jaccard join, the candidate side
    the band-collision index.  Three scalar counts cross-joined into
    one row — output size is constant at any corpus scale.
    """
    from project_fauna_spark.cache import cached
    from project_fauna_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )
    from project_fauna_spark.operators.extras3 import dedup_minhash_md5

    # Both pair frames are consumed TWICE (their scalar count + the
    # intersection join): persist the tiny id-pair outputs so each
    # full dedup pipeline executes once, not per-consumer (r12; the
    # dedup_minhash_lsh / ml_minhash_lsh pattern-4 fix).
    exact = cached(dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b"))
    cand = cached(
        dedup_minhash_md5(spark, sf_dir).select("doc_a", "doc_b").distinct()
    )
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    found = exact.join(cand, ["doc_a", "doc_b"]).agg(
        F.count("*").alias("n_exact_found")
    )
    return (
        n_exact.crossJoin(n_cand)
        .crossJoin(found)
        .select(
            "n_exact",
            "n_candidates",
            "n_exact_found",
            # Zero guard: ANSI Spark throws DIVIDE_BY_ZERO where DuckDB
            # yields NULL; a regenerated corpus with zero exact pairs
            # must produce NULL on both sides (ADVICE r4).
            F.when(
                F.col("n_exact") > 0,
                F.col("n_exact_found").cast("double") / F.col("n_exact"),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("recall"),
        )
    )


def _calibration_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE, sql_davg

    cls_sql = ORACLE["llm_quality_classifier"]
    return f"""
    WITH cls AS (SELECT * FROM ({cls_sql}) _c),
    b AS (
      SELECT CAST(floor(score * 10) AS INT) AS score_bin,
             n_words >= 50 AS gate, keep, score
      FROM cls
    )
    SELECT score_bin,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE gate) AS BIGINT) AS n_gate_pass,
           CAST(COUNT(*) FILTER (WHERE gate) AS DOUBLE) / COUNT(*) AS gate_pass_rate,
           CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_keep,
           {sql_davg('score', 30, 12)} AS avg_score
    FROM b GROUP BY score_bin
    """


@register(
    "llm_classifier_calibration",
    oracle_builder=_calibration_oracle,
)
def llm_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table for the linear quality classifier: per
    0.1-wide score bin, how often does an independent gate (the
    corpus-clean ≥50-token rule) agree?  A classifier whose pass rate
    doesn't rise monotonically with its own score is mis-calibrated —
    this is the audit run before trusting any cheap model-based filter
    with corpus-wide keep/drop power.

    Builds on the classifier's own output plan (lazy import; oracle
    composed via oracle_builder so rotation can't stale the reference).
    Scores are per-row IEEE doubles identical in both engines, so the
    bin = floor(score·10) assignment is deterministic; the per-bin mean
    score is decimal-accumulated (order-independent).  One
    map-combined aggregate to ~|bins| rows.
    """
    from project_fauna_spark.operators.llm_extras import llm_quality_classifier

    cls = llm_quality_classifier(spark, sf_dir)
    b = cls.select(
        F.floor(F.col("score") * 10).cast("int").alias("score_bin"),
        (F.col("n_words") >= 50).alias("gate"),
        "keep",
        "score",
    )
    return b.groupBy("score_bin").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("gate"), 1)).alias("n_gate_pass"),
        (
            F.count(F.when(F.col("gate"), 1)).cast("double") / F.count("*")
        ).alias("gate_pass_rate"),
        F.count(F.when(F.col("keep"), 1)).alias("n_keep"),
        (
            F.sum(F.col("score").cast("decimal(30,12)")).cast("double")
            / F.count("score")
        ).alias("avg_score"),
    )


@register(
    "dq_fact_consistency_audit",
    oracle="""
    WITH r AS (
      SELECT l_orderkey,
             SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS VARCHAR)
                      AS DECIMAL(30,8))) AS recomputed
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS VARCHAR) AS DECIMAL(30,8)) AS stored,
             r.recomputed
      FROM orders o JOIN r ON r.l_orderkey = o.o_orderkey
    ),
    e AS (
      SELECT o_orderkey,
             CAST(CAST(abs(stored - recomputed) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(stored AS VARCHAR) AS DOUBLE) AS rel_err,
             abs(stored - recomputed) AS abs_diff
      FROM j
    )
    SELECT CASE WHEN rel_err = 0 THEN 'exact'
                WHEN rel_err < 0.01 THEN 'lt_1pct'
                WHEN rel_err < 0.10 THEN 'lt_10pct'
                WHEN rel_err < 0.50 THEN 'lt_50pct'
                ELSE 'ge_50pct' END AS err_band,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(abs_diff) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_abs_diff
    FROM e GROUP BY 1
    """,
)
def dq_fact_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table fact consistency: the order header's stored total
    versus the total recomputed from its line items, bucketed by
    relative error — the reconciliation audit that catches silent
    drift between a denormalized rollup and its source of truth
    (here it reports the synthetic data's totals are generated
    independently — exactly what the audit exists to surface).

    The recompute is a decimal-exact map-combined aggregate per order;
    the header join shuffles on orderkey once; error banding is per-row
    on engine-identical doubles.  Output is |bands| rows at any scale.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    line_total = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(30,8)")
    r = l.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(line_total).alias("recomputed")
    )
    j = o.join(r, "o_orderkey").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(30,8)").alias("stored"),
        "recomputed",
    )
    abs_diff = F.abs(F.col("stored") - F.col("recomputed"))
    rel_err = abs_diff.cast("double") / F.col("stored").cast("double")
    e = j.select("o_orderkey", rel_err.alias("rel_err"), abs_diff.alias("abs_diff"))
    band = (
        F.when(F.col("rel_err") == 0, "exact")
        .when(F.col("rel_err") < 0.01, "lt_1pct")
        .when(F.col("rel_err") < 0.10, "lt_10pct")
        .when(F.col("rel_err") < 0.50, "lt_50pct")
        .otherwise("ge_50pct")
    )
    return e.groupBy(band.alias("err_band")).agg(
        F.count("*").alias("n_orders"),
        (F.sum("abs_diff").cast("double") / F.count("*")).alias("avg_abs_diff"),
    )


@register(
    "ingest_partitioned_pruning",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang IN ('en', 'de')
    """,
)
def ingest_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned write → pruned read: documents written
    ``partitionBy(lang)``, then read back with a partition-column
    filter — the layout that turns a lang-sliced scan from full-corpus
    I/O into touching exactly the matching directories (PartitionFilters
    in the scan node, pinned by test_round4_properties).

    At 100 TB the partitioned write is the difference between a
    language slice costing |corpus| and costing |slice|; writer-side,
    ``partitionBy`` shuffles nothing by itself (each task writes its
    partitions' files — pair with a repartition(lang) upstream when
    low-cardinality output files matter).
    """
    import os
    import tempfile

    # Path is keyed by (sf_dir, Spark application id): two concurrent
    # sessions on the same testdata (pytest + foreign-session sweep)
    # must never overwrite a directory the other is mid-read (ADVICE
    # r4); same-session re-runs still reuse/overwrite their own copy.
    key = sf_dir.strip("/").replace("/", "_")
    app_id = spark.sparkContext.applicationId
    out = os.path.join(tempfile.gettempdir(), f"fauna_part_lang_{key}_{app_id}")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    d.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang").isin("en", "de"))
    # lang comes back as the partition directory column; re-select to
    # pin column order and types to the oracle.
    return back.select("doc_id", F.col("lang").cast("string").alias("lang"), "n_chars")


def _near_dup_rate_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    pairs_sql = ORACLE["dedup_ngram_jaccard"]
    return f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql}) p),
    involved AS (
      SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE i.doc_id IS NOT NULL) AS BIGINT)
             AS n_near_dup,
           CAST(COUNT(*) FILTER (WHERE i.doc_id IS NOT NULL) AS DOUBLE)
             / COUNT(*) AS near_dup_rate
    FROM documents d LEFT JOIN involved i ON i.doc_id = d.doc_id
    GROUP BY d.source
    """


@register(
    "llm_near_dup_rate_by_source",
    oracle_builder=_near_dup_rate_oracle,
)
def llm_near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate rate per ingestion source: which feeds are
    polluting the corpus with near-copies?  This is the slice every
    curation dashboard leads with — the dedup pipeline's output joined
    back to provenance.

    The pair set is corpus-linear (df-capped candidates, verified
    pairs); involved doc ids are a tiny broadcast against the
    documents scan, and the rollup is one map-combined aggregate per
    source.  Oracle composed from the Jaccard oracle via
    oracle_builder (rotation-safe).
    """
    from project_fauna_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    # ONE explode instead of union(pairs, pairs): the union spelling
    # executed the whole verified-pair plan twice (r12; the CC edge
    # build fix).  Identical id multiset → identical distinct set.
    involved = (
        pairs.select(
            F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc_id")
        )
        .distinct()
        .select("doc_id", F.lit(True).alias("_nd"))
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        d.join(F.broadcast(involved), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("_nd"), 1)).alias("n_near_dup"),
            (
                F.count(F.when(F.col("_nd"), 1)).cast("double") / F.count("*")
            ).alias("near_dup_rate"),
        )
    )
