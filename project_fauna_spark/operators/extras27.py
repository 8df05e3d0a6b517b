"""Round-6 batch 21: supplier-concentration HHI and a malformed-CSV
ingestion audit.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.cache import cached
from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import dsum, register, sql_dsum

# --------------------------------------------------------------------------
# agg_supplier_hhi — market concentration per part type
# --------------------------------------------------------------------------

_SQL_SHARE = (
    "CAST(CAST(rev AS VARCHAR) AS DOUBLE) / CAST(CAST(tot AS VARCHAR) AS DOUBLE)"
)


@register(
    "agg_supplier_hhi",
    oracle=f"""
    WITH pr AS (
      SELECT p.p_type, l.l_suppkey,
             SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS VARCHAR)
                      AS DECIMAL(30,8))) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    t AS (SELECT p_type, SUM(rev) AS tot FROM pr GROUP BY 1),
    sh AS (
      SELECT pr.p_type, {_SQL_SHARE} AS share
      FROM pr JOIN t ON t.p_type = pr.p_type
    )
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           {sql_dsum('share * share', 30, 20)} AS hhi,
           MAX(share) AS top_share
    FROM sh GROUP BY p_type
    """,
)
def agg_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier concentration per part
    type: Σ (supplier revenue share)² — 1/n for a perfectly split
    market, 1.0 for a monopoly; the antitrust-style metric that says
    which categories have a single-supplier risk
    (``agg_gini_concentration`` and ``agg_lorenz_deciles`` measure
    inequality of ONE population; HHI scores concentration per
    category, squaring shares so big suppliers dominate).

    Revenue accumulates in exact decimal per (type, supplier); each
    share is one double division of VARCHAR-routed decimal edges
    (identical both engines); the HHI sum-of-squares is itself a
    cross-row double sum, so it re-enters decimal — accumulated at
    scale 20 (shares ≤ 1, so precision 30 never overflows) and cast
    back at the edge.  Scale: the only data-sized work is the
    lineitem⋈part equi join (partkey-colocatable) + one
    (type, supplier)-keyed aggregate; everything after is
    category-sized with a broadcast totals table.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "r"
        ),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    pr = cached(
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(F.col("r").cast("decimal(30,8)")).alias("rev"))
    )
    t = pr.groupBy("p_type").agg(F.sum("rev").alias("tot"))
    share = F.col("rev").cast("double") / F.col("tot").cast("double")
    return (
        pr.join(F.broadcast(t), "p_type")
        .select("p_type", share.alias("share"))
        .groupBy("p_type")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            dsum(F.col("share") * F.col("share"), 30, 20).alias("hhi"),
            F.max("share").alias("top_share"),
        )
    )


# --------------------------------------------------------------------------
# ingest_csv_malformed_audit — PERMISSIVE-mode corrupt-record accounting
# --------------------------------------------------------------------------

# Deterministic fixture: 40 good rows + 6 malformed lines covering the
# failure modes (short row, unparseable id, unparseable double, extra
# field, single field, short+bad).  num = i + 0.25 is dyadic, so the
# good-row sum (780 + 40·0.25 = 790.0) is exact and order-independent.
_CSV_GOOD = [(i, f"row{i}", f"{i}.25") for i in range(40)]
_CSV_BAD = [
    "100,onlytwo",
    "x,badid,3.5",
    "101,name,notanum",
    "102,name,4.5,extra",
    "bad",
    "y,z",
]
_CSV_SUM_GOOD = 790.0


def _malformed_csv_path(sf_dir: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(tempfile.gettempdir(), f"fauna_ingest_malformed_{key}")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "data.csv")
    lines = ["id,name,num"]
    # interleave a bad line after every 8th good row, deterministically
    bad = list(_CSV_BAD)
    for i, (a, b, c) in enumerate(_CSV_GOOD):
        lines.append(f"{a},{b},{c}")
        if i % 8 == 7 and bad:
            lines.append(bad.pop(0))
    lines.extend(bad)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return d


@register(
    "ingest_csv_malformed_audit",
    oracle=f"""
    SELECT CAST({len(_CSV_GOOD) + len(_CSV_BAD)} AS BIGINT) AS n_rows,
           CAST({len(_CSV_GOOD)} AS BIGINT) AS n_good,
           CAST({len(_CSV_BAD)} AS BIGINT) AS n_corrupt,
           CAST({len(_CSV_BAD)} AS DOUBLE)
             / {len(_CSV_GOOD) + len(_CSV_BAD)} AS corrupt_frac,
           CAST('{_CSV_SUM_GOOD!r}' AS DOUBLE) AS sum_num_good
    """,
)
def ingest_csv_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode dirty-CSV audit: read a fixture containing
    every classic malformation (short row, unparseable key,
    unparseable double, extra field, single token) with a declared
    schema + ``columnNameOfCorruptRecord``, and report the
    good/corrupt split and the numeric sum over CLEAN rows only — the
    quarantine accounting an ingestion pipeline emits before anyone
    trusts a feed (``ingest_csv_roundtrip`` proves lossless happy-path
    I/O; this proves the unhappy path is COUNTED, not silently
    dropped or crashed on).

    The fixture is generated from module constants, so the oracle is
    the closed-form expected audit row — the query's job is to make
    Spark's PERMISSIVE semantics reproduce it (probed: every
    malformation populates the corrupt column while still parsing the
    salvageable fields).  The clean-row sum is dyadic (k + 0.25) and
    therefore exact under any addition order.  The corrupt-column
    frame is cached before aggregation (Spark disallows queries over
    only the corrupt column on the lazy plan).  Scale: schema'd
    DataFrameReader with PERMISSIVE is the production path for
    multi-TB text feeds; the audit is one map-combined aggregate.
    """
    d = _malformed_csv_path(sf_dir)
    df = cached(
        spark.read.schema("id LONG, name STRING, num DOUBLE, _corrupt_record STRING")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(d)
    )
    is_bad = F.col("_corrupt_record").isNotNull()
    return df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(F.when(~is_bad, 1)).cast("long").alias("n_good"),
        F.count(F.when(is_bad, 1)).cast("long").alias("n_corrupt"),
        (F.count(F.when(is_bad, 1)).cast("double") / F.count("*")).alias(
            "corrupt_frac"
        ),
        F.sum(F.when(~is_bad, F.col("num"))).alias("sum_num_good"),
    )
