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

    # Save/restore the caller's knob instead of asserting absence —
    # a shell mid-way through the SCALING.md 1000x probe workflow has
    # it exported, and the test must neither fail nor clobber it
    # (ADVICE r9).
    prior = os.environ.pop("FAUNA_LSH_BANDS_IN_FLIGHT", None)
    try:
        base = run()
        for b in ("2", "3"):
            os.environ["FAUNA_LSH_BANDS_IN_FLIGHT"] = b
            assert run() == base, f"B={b} changed LSH output"
        # Knob validation (ADVICE r9): 0/-1 clamp to 1 (sequential
        # per-band passes, same candidate set); a non-integer warns and
        # falls back to single-pass — never a mid-query traceback.
        for b in ("0", "-1"):
            os.environ["FAUNA_LSH_BANDS_IN_FLIGHT"] = b
            assert run() == base, f"B={b} (clamped) changed LSH output"
        import warnings as _w

        os.environ["FAUNA_LSH_BANDS_IN_FLIGHT"] = "bogus"
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            assert run() == base, "non-integer fallback changed LSH output"
        assert any("FAUNA_LSH_BANDS_IN_FLIGHT" in str(c.message) for c in caught)
    finally:
        if prior is None:
            os.environ.pop("FAUNA_LSH_BANDS_IN_FLIGHT", None)
        else:
            os.environ["FAUNA_LSH_BANDS_IN_FLIGHT"] = prior
