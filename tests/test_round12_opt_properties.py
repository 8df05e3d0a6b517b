"""Round-12 OPTIMIZATION-round focused tests (operator internals that
changed for performance; results must be provably unchanged):

- ``llm_dedup_impact_on_mixture`` now derives its corpus totals from
  the per-language aggregate (Σ per-group counts) instead of a second
  full pass over a corpus-sized (text-carrying) cache pin.  The rewrite
  rests on two exact identities this file pins: the per-language rows
  partition the corpus (Σ n_raw == |documents|), and every share is the
  IEEE division of its exact int64 count by that derived total.
- ``dedup_connected_components`` now truncates the edge lineage with
  ``cached(...).localCheckpoint(eager=False)`` so the fixpoint loop's
  per-round plans stay O(loop state).  The checkpoint changes the
  frame's lifecycle (a fresh RDD per invocation, persist shared across
  invocations), so repeat invocation in ONE session — the bench and the
  driver's grading loop shape — must stay row-stable, and the released
  cache must not leak plan-visible state into the next invocation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_fauna_spark.plans import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def _release():
    from project_fauna_spark.cache import release_cached

    release_cached()


def test_mixture_totals_derive_from_per_lang_aggregate(spark):
    """Σ per-language n_raw must equal the corpus row count (the group
    rows partition the corpus), and each share must be exactly the IEEE
    double division of the int64 count by the derived total — the two
    identities the totals-from-aggregate rewrite relies on."""
    rows = QUERIES["llm_dedup_impact_on_mixture"](spark, SF_SMOKE).collect()
    _release()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    n_raw_total = sum(r["n_raw"] for r in rows)
    n_kept_total = sum(r["n_kept"] for r in rows)
    assert n_raw_total == n_docs
    assert 0 < n_kept_total <= n_raw_total
    for r in rows:
        # Python float division == Spark double division on exact int64
        # inputs: the comparison is bit-exact, not approximate.
        assert r["share_raw"] == r["n_raw"] / n_raw_total
        assert r["share_kept"] == r["n_kept"] / n_kept_total
        assert r["share_shift"] == r["share_kept"] - r["share_raw"]


def test_connected_components_repeat_invocation_stable(spark):
    """Two invocations in one session (the bench / grading-loop shape)
    must produce identical sorted rows: the per-invocation
    localCheckpoint and the cross-invocation persist reuse may not leak
    state or drift."""
    a = sorted(
        map(tuple, QUERIES["dedup_connected_components"](spark, SF_SMOKE).collect())
    )
    _release()
    b = sorted(
        map(tuple, QUERIES["dedup_connected_components"](spark, SF_SMOKE).collect())
    )
    _release()
    assert a == b
    # sanity: every doc appears exactly once with a component id <= its
    # own doc_id (min-label fixpoint)
    assert len(a) == len({t[0] for t in a})
    assert all(t[1] <= t[0] for t in a)
