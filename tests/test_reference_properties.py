"""Property-based differential tests: the engine's Catalyst expression
builders vs an independent pure-Python implementation of the reference
semantics (re-derived from SURVEY.md §2a; NOT imported from the
reference).

Hypothesis drives batches of generated inputs through BOTH paths; any
divergence in split/epoch/validate behavior is a bug in the
expression builders.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F, types as T

from project_fauna_spark.functions import (
    epoch_to_iso8601_utc,
    split_friends,
    validate_iso8601_utc,
)

AS_OF_STR = "2030-01-01 00:00:00"
AS_OF = datetime(2030, 1, 1, tzinfo=timezone.utc)


# --- independent reimplementation of reference semantics (utils.py) ---


def ref_split(s):
    if not s:
        return []
    return [t.strip() for t in s.split(",") if t.strip()]


def ref_epoch_to_iso(epoch):
    if epoch is None or epoch < 0:
        return None
    e = int(epoch)
    if e >= 10**18:
        ts = e / 1e9
    elif e >= 10**15:
        ts = e / 1e6
    elif e >= 10**12:
        ts = e / 1e3
    else:
        ts = float(e)
    try:
        dt = datetime.fromtimestamp(ts, tz=timezone.utc)
    except (OverflowError, OSError, ValueError):
        return None
    if dt > AS_OF:
        return None
    return dt.isoformat().replace("+00:00", "Z")


ISO_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z$")


def ref_validate(z):
    return z is None or bool(ISO_RE.match(z))


# --- differential properties ---

friends_text = st.text(
    alphabet=st.characters(whitelist_categories=["Lu", "Ll", "Nd", "Zs"], whitelist_characters=","),
    max_size=60,
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(st.none(), friends_text), min_size=1, max_size=8))
def test_split_friends_differential(spark, values):
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("s", T.StringType())])
    )
    got = [r["out"] for r in df.select(split_friends("s").alias("out")).collect()]
    assert got == [ref_split(v) for v in values]


epochs = st.one_of(
    st.none(),
    st.integers(min_value=-(10**6), max_value=2**63 - 1),  # LongType domain
    # Cluster around the unit thresholds where detection branches flip.
    st.integers(min_value=10**12 - 1000, max_value=10**12 + 1000),
    st.integers(min_value=10**15 - 1000, max_value=10**15 + 1000),
    st.integers(min_value=10**18 - 1000, max_value=10**18 + 1000),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(epochs, min_size=1, max_size=16))
def test_epoch_differential(spark, values):
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("e", T.LongType())])
    )
    got = [r["out"] for r in df.select(epoch_to_iso8601_utc("e", AS_OF_STR).alias("out")).collect()]
    want = [ref_epoch_to_iso(v) for v in values]
    assert got == want


iso_candidates = st.one_of(
    st.none(),
    st.text(max_size=40),
    st.datetimes(
        min_value=datetime(1970, 1, 1), max_value=datetime(2100, 1, 1)
    ).map(lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ")),
    st.datetimes(
        min_value=datetime(1970, 1, 1), max_value=datetime(2100, 1, 1)
    ).map(lambda d: d.strftime("%Y-%m-%dT%H:%M:%S+00:00")),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(iso_candidates, min_size=1, max_size=16))
def test_validate_iso_differential(spark, values):
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("s", T.StringType())])
    )
    got = [r["ok"] for r in df.select(validate_iso8601_utc("s").alias("ok")).collect()]
    assert got == [ref_validate(v) for v in values]


def test_partitioned_write_roundtrip(spark, tmp_path):
    """Partitioned sink: pruning-key layout + bounded files."""
    from project_fauna_spark.io import load_table
    from project_fauna_spark.sinks.files import write_partitioned_parquet

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_out")
    write_partitioned_parquet(e, out, ["event_type"], max_records_per_file=100)
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # Partition pruning: reading one event_type touches only its dir.
    one = back.filter(F.col("event_type") == "click")
    assert one.count() == e.filter(F.col("event_type") == "click").count()
    import glob

    assert glob.glob(f"{out}/event_type=click/*.parquet")
