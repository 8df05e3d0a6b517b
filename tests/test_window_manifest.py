"""Rotation guard: the driver grades the first 50 registry entries.

The round-6 window composition is pinned against the checked-in
``WINDOW_r6.txt`` manifest so an accidental import-order edit in
``plans/__init__.py`` (or a registration added to a pre-window module
mid-round) fails the suite instead of silently re-grading old queries
or perturbing the window the driver sees.

At each round START the rotation is performed deliberately: rewrite the
manifest together with ``plans/__init__.py`` in the same commit.
"""

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_first_50_match_manifest():
    manifest = (REPO / "WINDOW_r6.txt").read_text().split()
    assert len(manifest) == 50, "manifest must hold exactly 50 names"

    from project_fauna_spark.plans import QUERIES

    window = list(QUERIES)[:50]
    assert window == manifest, (
        "grading window drifted from WINDOW_r6.txt — if this is a "
        "deliberate round-start rotation, regenerate the manifest in the "
        "same commit; otherwise revert the plans/__init__.py or operator-"
        "module change that perturbed registration order.\n"
        f"first diff: {next(((i, a, b) for i, (a, b) in enumerate(zip(window, manifest)) if a != b), None)}"
    )


def test_window_fully_oracled():
    """Every window entry must have a DuckDB oracle (no no_oracle reds)."""
    from project_fauna_spark.plans import ORACLE, QUERIES

    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLE]
    assert not missing, f"window entries without oracle: {missing}"
