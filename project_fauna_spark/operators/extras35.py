"""Round-6 batch 29: fixed-width legacy ingest and sliding-window
velocity bursts.

Registered AFTER the round-6 grading window block (plans/__init__) —
new registrations must never perturb the first-50 window the driver
grades (pinned by tests/test_window_manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from project_fauna_spark.io import load_table
from project_fauna_spark.plans.registry import register

# --------------------------------------------------------------------------
# ingest_fixed_width_parse — the mainframe/COBOL-era text layout
# --------------------------------------------------------------------------

_FW_KEY_W = 10  # zero-padded order key
_FW_STATUS_W = 1  # single-char status
_FW_PRICE_W = 24  # space-padded shortest-repr double


@register(
    "ingest_fixed_width_parse",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey < 1000
    """,
)
def ingest_fixed_width_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text round-trip — the layout mainframe extracts and
    bank settlement files still arrive in: render an orders slice as
    35-char records (10-char zero-padded key, 1-char status, 24-char
    space-padded price), write real ``.txt`` files, read them back
    with ``spark.read.text`` and carve columns by SUBSTRING offsets —
    no delimiter anywhere, the schema lives entirely in the byte
    positions (the capability ``ingest_csv_roundtrip`` can't cover:
    there IS no separator to split on).

    Losslessness is by construction: Spark's double→string cast emits
    the shortest round-trip representation, so trim+cast restores the
    identical bits, and the zero-padded key strips back to the same
    long — the oracle reads the ORIGINAL rows, so any render/parse
    drift hash-fails.  Scale: the parse is three substrings per row,
    whole-stage codegen'd; fixed-width files split by line like any
    text source, so a 100 TB drop parallelizes per HDFS block.
    """
    from project_fauna_spark.operators.ingest import _roundtrip_dir

    out = _roundtrip_dir(sf_dir, "fixedwidth")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), _FW_KEY_W, "0"),
        F.col("o_orderstatus"),
        F.lpad(F.col("o_totalprice").cast("string"), _FW_PRICE_W, " "),
    )
    o.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(out)
    back = spark.read.text(out)
    return back.select(
        F.substring("value", 1, _FW_KEY_W).cast("long").alias("o_orderkey"),
        F.substring("value", _FW_KEY_W + 1, _FW_STATUS_W).alias("o_orderstatus"),
        F.trim(
            F.substring("value", _FW_KEY_W + _FW_STATUS_W + 1, _FW_PRICE_W)
        )
        .cast("double")
        .alias("o_totalprice"),
    )


# --------------------------------------------------------------------------
# event_velocity_burst — rate-limit / fraud velocity check
# --------------------------------------------------------------------------

_BURST_WINDOW_US = 60_000_000 - 1  # trailing 60 s, inclusive frame


@register(
    "event_velocity_burst",
    oracle=f"""
    WITH x AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    c AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                            RANGE BETWEEN {_BURST_WINDOW_US} PRECEDING
                                      AND CURRENT ROW) AS burst
      FROM x
    ),
    p AS (
      SELECT user_id, CAST(MAX(burst) AS BIGINT) AS peak_burst,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM c GROUP BY 1
    )
    SELECT user_id, peak_burst, n_events
    FROM p ORDER BY peak_burst DESC, user_id LIMIT 10
    """,
)
def event_velocity_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity check: each user's PEAK number of events inside any
    trailing 60-second window (exact integer-microsecond RANGE frame),
    top-10 burstiest users — the rate-limit / card-testing / scraper
    signal every abuse system computes first.
    ``event_bot_user_audit`` flags lifetime volume; a burst is the
    CONCENTRATION of that volume, which catches a 30-second script on
    an otherwise quiet account.

    The sliding count is one RANGE window keyed on user_id over exact
    ``unix_micros`` values (ties share a frame by VALUE, identically
    in both engines); state per user is bounded by the 60 s span.
    The final top-10 is a TakeOrdered with a total (peak, user_id)
    tie-break — never a global sort.
    """
    x = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    burst = F.count("*").over(
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_BURST_WINDOW_US, 0)
    )
    p = (
        x.select("user_id", burst.alias("burst"))
        .groupBy("user_id")
        .agg(
            F.max("burst").cast("long").alias("peak_burst"),
            F.count("*").alias("n_events"),
        )
    )
    return p.orderBy(F.col("peak_burst").desc(), "user_id").limit(10)
