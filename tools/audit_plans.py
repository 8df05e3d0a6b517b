#!/usr/bin/env python3
"""Registry-wide plan-shape audit (r12 optimization round).

Usage: python tools/audit_plans.py [sf_dir]

Builds (but does not execute) every registered query's plan and prints
one summary line per query: Exchange / join-strategy / Python-eval /
Window / Sort node counts from ``explain('formatted')`` text.  The
output is a ranking aid for the optimization pass — queries whose
INITIAL plan shows pathological shapes (cartesians, unexpected SMJ,
BatchEvalPython, very high Exchange counts) float to the top for
manual inspection.  Counts are initial-plan counts (AQE reuse and
coalescing land at runtime), so iterative fixpoints legitimately show
large numbers; the point is the diff and the outliers, not the
absolute values.
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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)

PATTERNS = [
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
    (r"\bMapInArrow\b|\bMapInPandas\b|\bPythonMapInArrow\b", "MapInArrow"),
    (r"\bWindowGroupLimit\b", "WindowGroupLimit"),
    (r"\bWindow\b", "Window"),
    (r"\bSort\b", "Sort"),
    (r"\bInMemoryTableScan\b", "InMemoryScan"),
]


def main() -> None:
    spark = get_spark(app_name="fauna-audit-plans")
    rows = []
    for name in QUERIES:
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            counts = {}
            for pat, label in PATTERNS:
                n = len(re.findall(pat, text))
                if n:
                    counts[label] = n
            rows.append((name, counts))
        except Exception as exc:  # noqa: BLE001
            rows.append((name, {"PLAN_FAILED": str(exc)[:120]}))
        finally:
            release_cached()
        c = rows[-1][1]
        print(f"{name}: " + ", ".join(f"{k}={v}" for k, v in c.items()), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
