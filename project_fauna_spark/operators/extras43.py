"""Round-6 batch 37: fill-in-the-middle training splits and engagement
streak distribution.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# llm_fim_split_plan — prefix / middle / suffix for infilling training
# --------------------------------------------------------------------------


def _fim_oracle() -> str:
    from project_fauna_spark.operators._oracle_shared import sql_h32 as _sql_h32

    ha = _sql_h32("CAST(doc_id AS VARCHAR)", "fim_a:")
    hb = _sql_h32("CAST(doc_id AS VARCHAR)", "fim_b:")
    return f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, ws, n,
             LEAST({ha} % (n + 1), {hb} % (n + 1)) AS lo,
             GREATEST({ha} % (n + 1), {hb} % (n + 1)) AS hi
      FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(lo AS BIGINT) AS prefix_len,
           CAST(hi - lo AS BIGINT) AS middle_len,
           CAST(n - hi AS BIGINT) AS suffix_len,
           CAST(n + 3 AS BIGINT) AS psm_len,
           CAST(hi - lo AS DOUBLE) / n AS middle_frac,
           md5(COALESCE(array_to_string(ws[lo + 1 : hi], ' '), ''))
             AS middle_digest
    FROM c
    """


@register("llm_fim_split_plan", oracle_builder=_fim_oracle)
def llm_fim_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle (FIM/PSM) training-split plan: two
    hash-derived cut points per document define prefix / middle /
    suffix spans, and the record is re-serialized as
    ``[PRE] prefix [SUF] suffix [MID] middle`` (psm_len = n + 3
    sentinels) — the infilling transform code models train with,
    planned deterministically so every epoch and every engine cuts
    the SAME middles (``llm_span_corruption_plan`` is the T5-style
    multi-span sibling; FIM is the single-span, order-rotated one).

    Cut points come from the portable 32-bit md5 fold mod (n+1) —
    reproducible, data-independent of content drift in OTHER rows;
    the middle's md5 digest rides along so a downstream consumer can
    verify the slice byte-for-byte.  All expression-level; no
    shuffle at all.
    """
    from project_fauna_spark.functions.wordhash import h32 as _h32

    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    ha = _h32(F.col("doc_id").cast("string"), "fim_a:") % (n + 1)
    hb = _h32(F.col("doc_id").cast("string"), "fim_b:") % (n + 1)
    lo, hi = F.least(ha, hb), F.greatest(ha, hb)
    c = d.select(
        "doc_id",
        ws.alias("ws"),
        n.alias("n"),
        lo.alias("lo"),
        hi.alias("hi"),
    )
    middle = F.array_join(
        F.slice(F.col("ws"), F.col("lo") + 1, F.col("hi") - F.col("lo")), " "
    )
    return c.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("lo").cast("long").alias("prefix_len"),
        (F.col("hi") - F.col("lo")).cast("long").alias("middle_len"),
        (F.col("n") - F.col("hi")).cast("long").alias("suffix_len"),
        (F.col("n") + 3).cast("long").alias("psm_len"),
        ((F.col("hi") - F.col("lo")).cast("double") / F.col("n")).alias(
            "middle_frac"
        ),
        F.md5(F.encode(middle, "UTF-8")).alias("middle_digest"),
    )


# --------------------------------------------------------------------------
# event_streak_histogram — how long do users stay daily-active?
# --------------------------------------------------------------------------


@register(
    "event_streak_histogram",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    anch AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INT) AS anchor
      FROM ud
    ),
    runs AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM anch GROUP BY user_id, anchor
    ),
    best AS (
      SELECT user_id, MAX(run_len) AS max_streak FROM runs GROUP BY user_id
    )
    SELECT CAST(max_streak AS BIGINT) AS max_streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM best GROUP BY max_streak
    """,
)
def event_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-streak distribution: each user's LONGEST run of
    consecutive active days (the day − row_number gaps-and-islands
    anchor), histogrammed over users — the habit-formation readout
    ("how many users ever hit a 7-day streak?") that powers streak
    badges and retention targets (``window_gaps_islands`` runs the
    same trick on event-id sequences; this is its calendar-day,
    per-user, distribution-level application).

    All integer: distinct (user, day), one user-keyed window, two
    map-combined aggregates, then a histogram over the tiny
    streak-length domain.  Deterministic with no ties to break —
    the output is a distribution, not a leaderboard.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    anch = ud.select(
        "user_id", F.date_sub(F.col("day"), rn).alias("anchor")
    )
    runs = anch.groupBy("user_id", "anchor").agg(F.count("*").alias("run_len"))
    best = runs.groupBy("user_id").agg(F.max("run_len").alias("max_streak"))
    return best.groupBy(
        F.col("max_streak").cast("long").alias("max_streak_days")
    ).agg(F.count("*").alias("n_users"))
