"""Round-4 behavior tests: hot-shingle df cap, tracked cache."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_drop_hot_shingles_removes_only_hot_hashes(spark):
    """A hash appearing in > MAX_SHINGLE_DF docs leaves the index; every
    other (doc_id, h) row survives untouched."""
    from project_fauna_spark.operators.dedup import MAX_SHINGLE_DF, _drop_hot_shingles

    hot_df = MAX_SHINGLE_DF + 5
    rows = [(i, 3, 999) for i in range(hot_df)]  # one hot hash: df = K+5
    rows += [(i, 3, 1000 + i) for i in range(50)]  # 50 rare hashes: df = 1
    ex = spark.createDataFrame(rows, "doc_id long, n int, h long")
    kept = _drop_hot_shingles(ex).collect()
    assert all(r.h != 999 for r in kept)
    assert sorted(r.h for r in kept) == [1000 + i for i in range(50)]


def test_ngram_jaccard_unaffected_by_inert_cap(spark):
    """At sf0.001 every shingle df is far below the cap, so the capped
    plan must reproduce the uncapped exact result (the cap engages only
    on genuine stop-phrases at production scale)."""
    from project_fauna_spark.operators.dedup import dedup_ngram_jaccard
    from project_fauna_spark.functions.shingles import shingles
    from project_fauna_spark.io import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_a, r.doc_b): r.jaccard for r in dedup_ngram_jaccard(spark, sf).collect()
    }
    # Uncapped brute-force reference over full string shingle sets.
    d = load_table(spark, sf, "documents").select(
        "doc_id", shingles(F.col("text")).alias("sgl")
    )
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("sgl").alias("sa"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("sgl").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == want


def test_release_cached_unpersists_tracked_frames(spark):
    from project_fauna_spark.cache import _TRACKED, cached, release_cached

    release_cached()
    df = cached(spark.range(10))
    df.count()
    assert df.storageLevel.useMemory
    n = release_cached()
    assert n >= 1
    assert not df.storageLevel.useMemory
    assert not _TRACKED
