"""Round-8 additions: semantic properties beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_fauna_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_component_representative_invariants(spark):
    """The keep/drop table must be internally consistent AND consistent
    with the component labeling it composes."""
    from project_fauna_spark.cache import release_cached

    reps = {r["component_id"]: r for r in QUERIES["dedup_component_representative"](spark, SF).collect()}
    release_cached()
    assert reps, "corpus has near-dup components at sf0.01"
    comp = (
        QUERIES["dedup_connected_components"](spark, SF)
        .filter(F.col("n_members") > 1)
        .collect()
    )
    release_cached()
    members: dict = {}
    for r in comp:
        members.setdefault(r["component_id"], []).append(r["doc_id"])
    assert set(reps) == set(members)
    for cid, r in reps.items():
        assert r["n_members"] == len(members[cid]) >= 2
        assert r["rep_doc_id"] in members[cid], "representative must be a member"
        assert 0 < r["rep_len"] <= r["total_len"]
        assert r["saved_len"] == r["total_len"] - r["rep_len"]


def test_component_representative_tie_breaks_to_min_doc_id(spark):
    """Synthetic replay of the struct-argmax: equal lengths must pick
    the smallest doc_id (first-occurrence-wins)."""
    df = spark.createDataFrame(
        [(1, 10, 7), (1, 30, 9), (1, 20, 9)],
        "component_id int, doc_id long, len long",
    )
    picked = F.max(F.struct(F.col("len").alias("l"), (-F.col("doc_id")).alias("nd")))
    out = df.groupBy("component_id").agg(
        (-picked.getField("nd")).alias("rep_doc_id")
    ).collect()[0]
    assert out["rep_doc_id"] == 20
