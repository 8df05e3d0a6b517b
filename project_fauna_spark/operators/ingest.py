"""Ingest-format operators: JSON/CSV round-trips and schema'd JSON
parsing — the non-parquet scan surface (SURVEY.md §2b scans).

Each round-trip query derives a deterministic file from a harness
table inside the query, writes it under a content-keyed /tmp path,
reads it back through the engine's schema-on-read ingest, and returns
the parsed rows; the oracle reproduces the expected output straight
from the base table, so the comparison certifies the whole
write→parse→project path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from project_fauna_spark.io import load_table, read_csv, read_json
from project_fauna_spark.plans.registry import register


def _roundtrip_dir(sf_dir: str, tag: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"fauna_ingest_{tag}_{key}")


@register(
    "ingest_jsonlines_roundtrip",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE event_id < 500
    """,
)
def ingest_jsonlines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events slice → JSON-lines on disk → schema'd read → projection.

    Covers: JSON sink serialization, JSON-lines source with declared
    schema + PERMISSIVE mode, nested-string re-parse.
    """
    out = _roundtrip_dir(sf_dir, "json")
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    e.select("event_id", "event_type", "props").coalesce(1).write.mode("overwrite").json(out)
    back = read_json(spark, out, "event_id LONG, event_type STRING, props STRING")
    return back.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@register(
    "ingest_csv_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey < 1000
    """,
)
def ingest_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders slice → CSV with header → schema'd read.

    Doubles survive the text round-trip exactly: Spark writes the
    shortest round-trip decimal representation and parses it back to
    the identical binary double.
    """
    out = _roundtrip_dir(sf_dir, "csv")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    o.select("o_orderkey", "o_orderstatus", "o_totalprice").coalesce(1).write.mode(
        "overwrite"
    ).option("header", "true").csv(out)
    return read_csv(spark, out, "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")


@register(
    "ingest_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           (json_extract_string(props, '$.k') IS NOT NULL) AS parsed_ok
    FROM events
    """,
)
def ingest_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with a declared struct schema (vs path extraction):
    the typed parse used when downstream wants real columns, not
    strings."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k LONG")
    return e.select(
        "event_id",
        parsed["k"].alias("k"),
        parsed["k"].isNotNull().alias("parsed_ok"),
    )


@register(
    "ingest_xml_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_custkey < 500
    """,
)
def ingest_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer slice → XML on disk → schema'd XML read (Spark 4
    native ``format("xml")``).

    Covers the remaining text-format corner of the scan surface
    (parquet/ORC/JSON/CSV elsewhere).  Doubles survive because Spark
    writes shortest-round-trip decimals and parses them back to the
    identical binary — same argument as the CSV round-trip.
    """
    out = _roundtrip_dir(sf_dir, "xml")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    c.select("c_custkey", "c_name", "c_acctbal").coalesce(1).write.mode(
        "overwrite"
    ).option("rootTag", "customers").option("rowTag", "customer").format("xml").save(out)
    return (
        spark.read.schema("c_custkey LONG, c_name STRING, c_acctbal DOUBLE")
        .option("rowTag", "customer")
        .format("xml")
        .load(out)
    )
