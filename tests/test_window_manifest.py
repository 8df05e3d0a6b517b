"""Rotation guard: the driver grades the first 50 registry entries.

The round-9 window composition is pinned against the checked-in
``WINDOW_r9.txt`` manifest so an accidental import-order edit in
``plans/__init__.py`` (or a registration added to a pre-window module
mid-round) fails the suite instead of silently re-grading old queries
or perturbing the window the driver sees.

At each round START the rotation is performed deliberately: rewrite the
manifest together with ``plans/__init__.py`` in the same commit.
"""

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_first_50_match_manifest():
    from project_fauna_spark.plans.window import WINDOW_MANIFEST

    manifest = (REPO / WINDOW_MANIFEST).read_text().split()
    assert len(manifest) == 50, "manifest must hold exactly 50 names"

    from project_fauna_spark.plans import QUERIES

    window = list(QUERIES)[:50]
    assert window == manifest, (
        f"grading window drifted from {WINDOW_MANIFEST} — if this is a "
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


def test_operator_module_direct_import_is_worker_safe():
    """A Spark Python worker unpickling a module-level UDF imports its
    HOST module first; that import triggers plans/__init__ while the
    host is mid-import in sys.modules, so its registrations are absent
    in that interpreter.  Anything plans/__init__ executes must
    tolerate that partial registry — a hard assert there killed every
    udf_surface query the moment a udf name entered GRADING_WINDOW
    (caught on the r10-rotation branch).  Reproduce the worker's
    import shape in a clean interpreter for the modules that pickle
    UDFs by reference."""
    import subprocess
    import sys

    for mod in ("udf_surface", "multimodal", "streaming_batch"):
        r = subprocess.run(
            [sys.executable, "-c", f"import project_fauna_spark.operators.{mod}"],
            capture_output=True,
            text=True,
            cwd=str(REPO),
        )
        assert r.returncode == 0, f"{mod}: {r.stderr[-2000:]}"

    # Window-independent variant: force GRADING_WINDOW to contain a name
    # the mid-import module registers, so the hazard fires regardless of
    # what the CURRENT window holds (the plain imports above only cover
    # it when the real window includes one of those modules' names).
    probe = (
        "import sys, types\n"
        "fake = types.ModuleType('project_fauna_spark.plans.window')\n"
        "fake.GRADING_WINDOW = ('udf_grouped_map',)\n"
        "fake.WINDOW_MANIFEST = 'WINDOW_synthetic.txt'\n"
        "sys.modules['project_fauna_spark.plans.window'] = fake\n"
        "import project_fauna_spark.operators.udf_surface\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True, cwd=str(REPO)
    )
    assert r.returncode == 0, f"synthetic-window worker import: {r.stderr[-2000:]}"


def test_no_module_level_cross_operator_imports():
    """A module-level import of another REGISTERING operator module
    executes that module's @register calls at the importer's position
    in plans/__init__.py — silently perturbing the grading window (the
    round-4 lesson, re-hit by clustering.py importing llm_extras at the
    round-7 rotation).  Shared SQL belongs in operators/_oracle_shared,
    shared Spark helpers in functions/; cross-operator query reuse is a
    lazy import inside the function body."""
    import ast

    ops = REPO / "project_fauna_spark" / "operators"
    nonregistering = {"_oracle_shared"}
    offenders = []

    def module_level_imports(node):
        """Imports that EXECUTE at import time: everything except
        function/lambda bodies (try/except, if-blocks, with-blocks at
        module level all run on import and must be caught too)."""
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            return
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            yield node
        for child in ast.iter_child_nodes(node):
            yield from module_level_imports(child)

    for f in sorted(ops.glob("*.py")):
        mod = f.stem
        for node in module_level_imports(ast.parse(f.read_text())):
            if isinstance(node, ast.ImportFrom):
                if node.level > 0:
                    # Relative import: `from .extras3 import x` names the
                    # sibling in module; `from . import extras3` (and
                    # `from ..operators import extras3`) in names.  Any
                    # shape executes the sibling's @register calls at the
                    # importer's registry position (ADVICE r7).
                    candidates = [a.name for a in node.names]
                    if node.module:
                        candidates.append(node.module.split(".")[0])
                    for leaf in candidates:
                        if (
                            leaf not in nonregistering
                            and leaf != mod
                            and (ops / f"{leaf}.py").exists()
                        ):
                            offenders.append(f"{mod} -> {leaf} (relative)")
                    continue
                targets = [node.module] if node.module else []
            else:
                targets = [a.name for a in node.names]
            for t in targets:
                if t.startswith("project_fauna_spark.operators."):
                    leaf = t.split(".")[-1]
                    if leaf not in nonregistering and leaf != mod:
                        offenders.append(f"{mod} -> {leaf}")
    assert offenders == [], offenders
