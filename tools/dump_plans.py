#!/usr/bin/env python3
"""Dump .explain('formatted') for every headline query to plans/r12/.

Usage: python tools/dump_plans.py <suffix> [name ...]

Writes plans/r12/<query>_<suffix>.txt for each headline query (or the
subset given).  The explain output is the INITIAL plan (AQE shows
``isFinalPlan=false``) — what the optimizer chose before runtime
re-planning; Exchange counts, join strategies, PushedFilters and
Python-eval nodes are all visible at this stage.

Also prints a one-line plan summary per query (exchanges, joins,
python-eval nodes) so before/after diffs are quick to read.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_fauna_spark.session import get_spark
from project_fauna_spark.cache import release_cached
from project_fauna_spark.plans import QUERIES
from bench import HEADLINE

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("FAUNA_PLANS_ROUND", "r12"),
)


def summarize(text: str) -> str:
    counts = {}
    for pat, label in [
        (r"\bExchange\b", "Exchange"),
        (r"\bReusedExchange\b", "ReusedExchange"),
        (r"\bBroadcastExchange\b", "BroadcastExchange"),
        (r"\bSortMergeJoin\b", "SMJ"),
        (r"\bBroadcastHashJoin\b", "BHJ"),
        (r"\bShuffledHashJoin\b", "SHJ"),
        (r"\bBroadcastNestedLoopJoin\b", "BNLJ"),
        (r"\bCartesianProduct\b", "Cartesian"),
        (r"\bBatchEvalPython\b", "BatchEvalPython"),
        (r"\bArrowEvalPython\b", "ArrowEvalPython"),
        (r"\bMapInArrow\b|\bMapInPandas\b|\bPythonMapInArrow\b", "MapInArrow/Pandas"),
        (r"\bWindowGroupLimit\b", "WindowGroupLimit"),
        (r"\bWindow\b", "Window"),
        (r"\bSort\b", "Sort"),
        (r"\bInMemoryTableScan\b", "InMemoryScan"),
    ]:
        n = len(re.findall(pat, text))
        if n:
            counts[label] = n
    return ", ".join(f"{k}={v}" for k, v in counts.items())


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="fauna-dump-plans")
    for name in names:
        if name not in QUERIES:
            continue
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"PLAN FAILED: {exc}\n"
        finally:
            release_cached()
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {summarize(text)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
