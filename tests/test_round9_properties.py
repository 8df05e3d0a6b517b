"""Round-9 additions: semantic properties beyond oracle parity."""

from __future__ import annotations

import os

from project_fauna_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_lsh_band_staging_is_result_invariant(spark):
    """FAUNA_LSH_BANDS_IN_FLIGHT must never change dedup_minhash_lsh's
    output: the staged candidate set is the union over band groups of
    bucket collisions, deduped — by construction the same set the
    single-pass plan produces.  Pinned at B=2 (4 passes) and B=3
    (3 passes, last one ragged) against the default single pass."""
    from project_fauna_spark.cache import release_cached

    def run():
        rows = sorted(map(tuple, QUERIES["dedup_minhash_lsh"](spark, SF).collect()))
        release_cached()
        return rows

    assert "FAUNA_LSH_BANDS_IN_FLIGHT" not in os.environ
    base = run()
    try:
        for b in ("2", "3"):
            os.environ["FAUNA_LSH_BANDS_IN_FLIGHT"] = b
            assert run() == base, f"B={b} changed LSH output"
    finally:
        os.environ.pop("FAUNA_LSH_BANDS_IN_FLIGHT", None)
