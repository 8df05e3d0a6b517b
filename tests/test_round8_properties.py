"""Round-8 additions: semantic properties beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_fauna_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_component_representative_invariants(spark):
    """The policy-contrast table must be internally consistent AND
    consistent with the component labeling it composes."""
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
        assert r["rep_longest"] in members[cid]
        assert r["rep_first"] == min(members[cid]), "first = min doc_id member"
        assert 0 < r["rep_len_longest"] <= r["total_len"]
        assert 0 < r["rep_len_first"] <= r["rep_len_longest"]
        assert r["saved_len_longest"] == r["total_len"] - r["rep_len_longest"]
        assert r["saved_len_first"] == r["total_len"] - r["rep_len_first"]
        # keep-longest retains the most content, so it saves the FEWEST
        # bytes; keep-first saves at least as much
        assert r["saved_len_first"] >= r["saved_len_longest"]
        assert r["policies_agree"] == (r["rep_longest"] == r["rep_first"])


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


def test_suppress_repeats_conserves_events(spark):
    """Every event lands in exactly one burst: sum(n_suppressed) +
    n_bursts == total events, per (user, event_type) and globally."""
    from project_fauna_spark.cache import release_cached
    from project_fauna_spark.io import load_table

    rows = QUERIES["stream_dedup_suppress_repeats"](spark, SF).collect()
    release_cached()
    assert rows
    per_key: dict = {}
    for r in rows:
        assert r["n_suppressed"] >= 0
        k = (r["user_id"], r["event_type"])
        per_key[k] = per_key.get(k, 0) + r["n_suppressed"] + 1
    truth = {
        (t["user_id"], t["event_type"]): t["n"]
        for t in load_table(spark, SF, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_key == truth


def test_scalar_hof_python_replay(spark):
    """The HOF battery must agree with a plain-Python replay of the
    same word-level definitions on every row."""
    from project_fauna_spark.cache import release_cached
    from project_fauna_spark.io import load_table

    out = {r["doc_id"]: r for r in QUERIES["scalar_higher_order_fns"](spark, SF).collect()}
    release_cached()
    docs = {
        d["doc_id"]: d["text"]
        for d in load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    }
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        words = text.split(" ")
        r = out[doc_id]
        assert r["total_chars"] == sum(len(w) for w in words)
        assert r["n_data"] == sum(1 for w in words if w == "data")
        assert r["mentions_engine"] == any(w in ("spark", "query") for w in words)
        assert r["first5_upper"] == "|".join(w.upper() for w in words[:5])
        assert r["long_words_20"] == "|".join(w for w in words[:20] if len(w) > 4)
        assert r["has_the_early"] == ("the" in words[:50])
