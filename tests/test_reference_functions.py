"""Golden-value tests for the reference-semantics expression builders.

Golden values lifted from the reference test suite
(/root/reference/tests/test_util.py, FIXTURES.md §2) — the engine must
reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from project_fauna_spark.functions import (
    batch_index,
    epoch_to_iso8601_utc,
    split_friends,
    validate_iso8601_utc,
)

AS_OF = "2030-01-01 00:00:00"


def _eval_split(spark, value):
    df = spark.createDataFrame([(value,)], T.StructType([T.StructField("s", T.StringType())]))
    return df.select(split_friends("s").alias("out")).first()["out"]


def test_split_friends_golden(spark):
    assert _eval_split(spark, "Dog, Kangaroo, Sea Lions") == ["Dog", "Kangaroo", "Sea Lions"]
    assert _eval_split(spark, "") == []
    assert _eval_split(spark, None) == []
    assert _eval_split(spark, " , a,, b ,") == ["a", "b"]


def _eval_epoch(spark, value):
    df = spark.createDataFrame([(value,)], T.StructType([T.StructField("e", T.LongType())]))
    return df.select(epoch_to_iso8601_utc("e", AS_OF).alias("out")).first()["out"]


def test_epoch_conversions_golden(spark):
    assert _eval_epoch(spark, 0) == "1970-01-01T00:00:00Z"
    assert _eval_epoch(spark, 1_577_836_800_000) == "2020-01-01T00:00:00Z"
    assert _eval_epoch(spark, 1_577_836_800_000_000) == "2020-01-01T00:00:00Z"
    assert _eval_epoch(spark, 1_577_836_800_000_000_000) == "2020-01-01T00:00:00Z"
    assert _eval_epoch(spark, -1) is None
    assert _eval_epoch(spark, None) is None
    # ms epoch with fractional seconds → 6-digit fraction (isoformat parity)
    assert _eval_epoch(spark, 1_348_692_957_651) == "2012-09-26T20:55:57.651000Z"
    # future guard: 2040 epoch > as_of 2030 → NULL
    assert _eval_epoch(spark, 2_208_988_800) is None


def test_validate_iso_golden(spark):
    rows = [
        ("2020-01-01T00:00:00Z", True),
        ("1999-12-31T23:59:59.123Z", True),
        ("2020-01-01T00:00:00+00:00", False),
        ("2020-01-01", False),
        (None, True),
    ]
    df = spark.createDataFrame(
        [(s,) for s, _ in rows], T.StructType([T.StructField("s", T.StringType())])
    )
    got = [r["ok"] for r in df.select(validate_iso8601_utc("s").alias("ok")).collect()]
    assert got == [ok for _, ok in rows]


def test_batch_index_chunking(spark):
    # 3 records at batch_size=2 → batches of sizes [2, 1]
    # (reference tests/test_pipeline.py:52-55)
    df = spark.range(1, 4).select(batch_index(F.col("id"), 2).alias("b"))
    sizes = [r["n"] for r in df.groupBy("b").count().withColumnRenamed("count", "n").orderBy("b").collect()]
    assert sizes == [2, 1]
    # clamp: batch_size=0 → 1
    df = spark.range(1, 4).select(batch_index(F.col("id"), 0).alias("b"))
    assert df.distinct().count() == 3
