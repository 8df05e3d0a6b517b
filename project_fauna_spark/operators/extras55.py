"""Round-8 addition: duplicate-cluster representative selection.

The stage a production dedup pipeline runs AFTER connected components:
each near-dup cluster keeps exactly one representative (the
highest-quality member, ties to the earliest doc) and drops the rest —
the decision table that turns a component labeling into an actual
keep/drop list and a measurable byte savings.

Registered after extras54 so the pinned round-8 window is untouched;
fills round 9's one spare seat (ADVICE r6 throttle: 1 addition vs 50
graded this round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register


def _component_representative_oracle() -> str:
    from project_fauna_spark.plans.registry import ORACLE

    cc_sql = ORACLE["dedup_connected_components"]
    return f"""
    WITH comp AS ({cc_sql}),
    d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len FROM documents),
    j AS (
      SELECT c.component_id, c.n_members, c.doc_id, d.len
      FROM comp c JOIN d USING (doc_id)
      WHERE c.n_members > 1
    ),
    best AS (SELECT component_id, MAX(len) AS rep_len FROM j GROUP BY component_id),
    rep AS (
      SELECT j.component_id, MIN(j.doc_id) AS rep_doc_id
      FROM j JOIN best ON best.component_id = j.component_id
                      AND j.len = best.rep_len
      GROUP BY j.component_id
    )
    SELECT j.component_id,
           CAST(MAX(j.n_members) AS BIGINT) AS n_members,
           ANY_VALUE(rep.rep_doc_id) AS rep_doc_id,
           ANY_VALUE(best.rep_len) AS rep_len,
           CAST(SUM(j.len) AS BIGINT) AS total_len,
           CAST(SUM(j.len) - ANY_VALUE(best.rep_len) AS BIGINT) AS saved_len
    FROM j
    JOIN best ON best.component_id = j.component_id
    JOIN rep ON rep.component_id = j.component_id
    GROUP BY j.component_id
    """


@register(
    "dedup_component_representative",
    oracle_builder=_component_representative_oracle,
)
def dedup_component_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection over the near-dup component graph: for
    every multi-member component, keep the longest member (quality
    proxy: exact character length — deterministic and engine-portable,
    where a model score would not be), ties broken to the SMALLEST
    doc_id (first-occurrence-wins, the ``dedup_incremental_new_batch``
    convention), and report the byte savings of dropping the rest.

    The argmax is ONE struct-max aggregate (``max(struct(len,
    -doc_id))`` — lexicographic struct ordering gives max length then
    min doc_id; the repo's standard tie-safe argmax), so the whole
    stage costs one ids+length join and one aggregate on top of the
    CC fixpoint — no text ever shuffles (length folds at the scan),
    and every output is an exact integer (no float edge at all).
    At 100 TB this is the keep/drop decision table the rewrite job
    consumes; components are near-dup families so the per-key state
    is family-sized, never corpus-sized.
    """
    from project_fauna_spark.operators.dedup import dedup_connected_components

    comp = dedup_connected_components(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("len")
    )
    j = comp.filter(F.col("n_members") > 1).join(d, "doc_id")
    picked = F.max(
        F.struct(F.col("len").alias("l"), (-F.col("doc_id")).alias("nd"))
    )
    return j.groupBy("component_id").agg(
        F.max("n_members").cast("long").alias("n_members"),
        (-picked.getField("nd")).alias("rep_doc_id"),
        F.max("len").alias("rep_len"),
        F.sum("len").cast("long").alias("total_len"),
        (F.sum("len") - F.max("len")).cast("long").alias("saved_len"),
    )
