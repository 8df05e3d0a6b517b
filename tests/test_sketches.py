"""Accuracy pins for the mergeable-sketch operators.

`agg_hll_sketch_merge`'s graded edge carries only exact counts and
bound booleans (raw HIP estimates are engine/union-order specific);
this test pins the raw estimates via the underlying
`hll_segment_estimates` frame: estimates must sit within HLL error
bounds of the exact distinct counts, and the union-of-sketches total
must agree with the directly-computed global distinct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_fauna_spark.operators.modern_sql import hll_segment_estimates
from project_fauna_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def test_hll_estimates_within_bounds(spark):
    rows = {r["c_mktsegment"]: r for r in hll_segment_estimates(spark, SF_DIR).collect()}
    total = rows.pop("__total__")
    assert len(rows) == 5
    for seg, r in rows.items():
        # default lgConfigK=12 → relative error ~1.6%; allow 5%
        assert abs(r["estimate"] - r["exact"]) <= max(3, 0.05 * r["exact"]), seg
    # the union row's exact is the sum of disjoint per-segment exacts
    assert abs(total["estimate"] - total["exact"]) <= max(3, 0.05 * total["exact"])


def test_hll_union_tracks_direct_global_sketch(spark):
    """Sketch mergeability: union of per-segment sketches estimates the
    same population as one global sketch built directly.  NOT asserted
    as equality — DataSketches HLL uses a HIP estimator, which is
    insertion/union-order dependent, so merged and direct sketches can
    differ by a few counts; both must sit within error bounds of the
    exact answer."""
    from project_fauna_spark.io import load_table

    o = load_table(spark, SF_DIR, "orders")
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est")
    ).collect()[0]["est"]
    rows = {
        r["c_mktsegment"]: r
        for r in hll_segment_estimates(spark, SF_DIR).collect()
    }
    merged, exact = rows["__total__"]["estimate"], rows["__total__"]["exact"]
    assert abs(direct - exact) <= 0.05 * exact
    assert abs(merged - exact) <= 0.05 * exact
