"""Oracle-SQL fragments shared across operator modules.

Kept in a module that registers NO queries: registry iteration order is
import order (``plans/__init__``), and importing a sibling operator
module for a helper would drag its registrations ahead of the intended
driver grading window.

DuckDB rendering of the reference epoch→ISO pipeline
(/root/reference/src/animals_etl/utils.py:20-48): float-seconds
division with half-even µs rounding, unit auto-detect by magnitude.
"""

from __future__ import annotations

AS_OF = "2030-01-01 00:00:00"

# {e} is a BIGINT epoch expression; NULL/negative handled by callers
# via CASE.
_SQL_EPOCH_TO_US = """
    CAST(floor((CAST({e} AS DOUBLE) / (CASE
        WHEN {e} >= 1000000000000000000 THEN 1000000000.0
        WHEN {e} >= 1000000000000000 THEN 1000000.0
        WHEN {e} >= 1000000000000 THEN 1000.0
        ELSE 1.0 END))) AS BIGINT) * 1000000
    + CAST(round_even((CAST({e} AS DOUBLE) / (CASE
        WHEN {e} >= 1000000000000000000 THEN 1000000000.0
        WHEN {e} >= 1000000000000000 THEN 1000000.0
        WHEN {e} >= 1000000000000 THEN 1000.0
        ELSE 1.0 END)
      - floor(CAST({e} AS DOUBLE) / (CASE
        WHEN {e} >= 1000000000000000000 THEN 1000000000.0
        WHEN {e} >= 1000000000000000 THEN 1000000.0
        WHEN {e} >= 1000000000000 THEN 1000.0
        ELSE 1.0 END))) * 1000000.0, 0) AS BIGINT)
"""


def _sql_epoch_to_iso(e: str, as_of: str = AS_OF) -> str:
    us = _SQL_EPOCH_TO_US.format(e=e)
    return f"""
      CASE WHEN {e} IS NULL OR {e} < 0 THEN NULL
           WHEN make_timestamp({us}) > TIMESTAMP '{as_of}' THEN NULL
           WHEN ({us}) % 1000000 = 0
             THEN strftime(make_timestamp({us}), '%Y-%m-%dT%H:%M:%SZ')
           ELSE strftime(make_timestamp({us}), '%Y-%m-%dT%H:%M:%S.%fZ')
      END
    """


# Timestamp rendering at compared edges.  Raw TimestampType at a graded
# edge is only UTC-safe because collect() converts via the driver's
# system timezone — format to a string instead (engine convention).
TS_FMT = "yyyy-MM-dd HH:mm:ss"
SQL_TS_FMT = "%Y-%m-%d %H:%M:%S"
TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"
SQL_TS_FMT_US = "%Y-%m-%d %H:%M:%S.%f"


def _fmt_ts(col, fmt: str = TS_FMT):
    from pyspark.sql import functions as F

    return F.date_format(col, fmt)


# DuckDB spelling of the repo's index-ordered cosine fold (kept here, in a
# non-registering module, so importing it never perturbs registry order —
# module import order IS the driver's grading window).
SQL_COS = """
  list_reduce(list_transform(range(1, len({a})+1), k -> {a}[k] * {b}[k]), (s,v) -> s+v)
  / sqrt( list_reduce(list_transform({a}, x -> x*x), (s,v) -> s+v)
        * list_reduce(list_transform({b}, x -> x*x), (s,v) -> s+v) )
"""
