"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`project_fauna_spark`; this module only
adapts the registry to the driver's calling convention.  The driver
builds its OWN SparkSession, so every query path runs
``configure_session`` (runtime-settable confs: UTC, nanos-as-long,
Arrow, AQE) before touching data.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from project_fauna_spark.session import configure_session
from project_fauna_spark.plans import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Mirrors the reference pipeline end-to-end on the events table:
    parse JSON props, normalize a mixed-unit epoch column with the
    reference's T2 semantics, null-filter, aggregate by event_type
    (scan → scalar transforms → agg in ONE lazy Catalyst plan).
    """
    configure_session(spark)
    from pyspark.sql import functions as F

    from project_fauna_spark.functions import epoch_to_iso8601_utc, split_friends
    from project_fauna_spark.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    us = F.unix_micros(F.col("ts"))
    mixed_epoch = (
        F.when(F.col("event_id") % 3 == 0, F.expr("unix_micros(ts) div 1000000"))
        .when(F.col("event_id") % 3 == 1, F.expr("unix_micros(ts) div 1000"))
        .otherwise(us)
    )
    enriched = events.select(
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        epoch_to_iso8601_utc(mixed_epoch, "2030-01-01 00:00:00").alias("ts_iso"),
        split_friends(F.concat_ws(",", "event_type", F.lit(" bot "), F.lit(""))).alias("tags"),
    )
    return (
        enriched.filter(F.col("ts_iso").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("sum_value"),
            F.countDistinct("prop_k").alias("n_distinct_k"),
            F.max("ts_iso").alias("max_ts_iso"),
        )
    )


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        # The driver grades 50 queries sequentially in ONE session and
        # never unpersists; release the PREVIOUS query's tracked caches
        # here so its pinned frames don't accumulate across the round.
        from project_fauna_spark.cache import release_cached

        release_cached()
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return dict(ORACLE)
