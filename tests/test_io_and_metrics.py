"""JSON/CSV ingest (schema-on-read + PERMISSIVE tolerance) and the
observe-based quality metric (reference T4/S4 semantics)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from project_fauna_spark.io import read_csv, read_json
from project_fauna_spark.pipeline import transform_with_metrics

AS_OF = "2030-01-01 00:00:00"


def test_read_json_permissive(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text(
        '{"id": 1, "name": "Dog", "born_at": 1348692957651}\n'
        '{"id": 2, "name": "Cat"}\n'
        "THIS IS NOT JSON\n"
    )
    df = read_json(spark, str(p), "id LONG, name STRING, born_at LONG")
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["born_at"] == 1348692957651
    assert rows[2]["born_at"] is None
    corrupt = [r for r in rows.values() if r["id"] is None]
    assert len(corrupt) == 1 and corrupt[0]["_corrupt_record"] == "THIS IS NOT JSON"


def test_read_csv_schema(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,name,score\n1,Dog,3.5\n2,Cat,\n")
    df = read_csv(spark, str(p), "id LONG, name STRING, score DOUBLE")
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] == 3.5
    assert rows[2]["score"] is None


def test_transform_quality_metric(spark):
    details = spark.createDataFrame(
        [
            (1, "Dog", "a,b", 1348692957651),       # valid ms epoch
            (2, "Cat", "", -5),                      # negative → nulled
            (3, "Mouse", None, 4102444800000000000),  # year 2100 ns > as_of → nulled
            (4, "Owl", "x", None),                   # missing → NOT counted
        ],
        "id LONG, name STRING, friends STRING, born_at LONG",
    )
    out, obs = transform_with_metrics(details, AS_OF)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["born_at"] == "2012-09-26T20:55:57.651000Z"
    assert rows[2]["born_at"] is None
    assert obs.get["n_invalid_born_at"] == 2
    assert obs.get["n_rows"] == 4
    assert "_raw_born_at" not in out.columns
