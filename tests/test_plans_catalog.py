"""Parameterized SQL runner, column mapping, warehouse, idempotent append."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from dawis_spark.catalog import Warehouse
from dawis_spark.operators.idempotent import idempotent_append
from dawis_spark.plans.column_mapping import apply_column_mapping
from dawis_spark.plans.sql_runner import resolve_parameters, run_query


def test_resolve_date_days_ago():
    out = resolve_parameters(
        {"d": {"dateDaysAgo": 3}, "s": "x", "n": 7}, today=dt.date(2024, 1, 10)
    )
    assert out == {"d": dt.date(2024, 1, 7), "s": "x", "n": 7}


def test_resolve_rejects_unknown_dynamic():
    with pytest.raises(ValueError):
        resolve_parameters({"d": {"weeksAgo": 1}})


def test_run_query_binds_typed_params(spark):
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").createOrReplaceTempView(
        "t_rq"
    )
    out = run_query(spark, "SELECT id FROM t_rq WHERE s = :v", {"v": "b"}).collect()
    assert [r["id"] for r in out] == [2]


def test_column_mapping_flat_nested_array(spark):
    df = spark.createDataFrame(
        [(1, ("x", 2), [("y", 3)])],
        "a int, st struct<f1:string,f2:int>, arr array<struct<g1:string,g2:int>>",
    )
    out = apply_column_mapping(df, {"a": "A", "st.f1": "renamed", "arr.g1": "h1"})
    assert out.columns == ["A", "st", "arr"]
    assert out.schema["st"].dataType.fieldNames() == ["renamed", "f2"]
    assert out.schema["arr"].dataType.elementType.fieldNames() == ["h1", "g2"]
    row = out.first()
    assert row["st"]["renamed"] == "x" and row["arr"][0]["h1"] == "y"


def test_column_mapping_rejects_deep_paths(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        apply_column_mapping(df, {"a.b.c": "x"})


def test_warehouse_roundtrip_partitioned(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "date string, v int"
    )
    wh.write(df, "facts", partition_by=["date"])
    assert wh.exists("facts")
    assert wh.read("facts").count() == 2
    # append disposition
    wh.write(df.filter(F.col("v") == 1), "facts", partition_by=["date"])
    assert wh.read("facts").count() == 3
    # truncate disposition
    wh.write(df, "facts", mode="overwrite", partition_by=["date"])
    assert wh.read("facts").count() == 2


def test_idempotent_append_skips_existing_slices(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    batch = spark.createDataFrame(
        [("p1", "2024-01-01", 1.0), ("p1", "2024-01-01", 2.0)],
        "property string, date string, v double",
    )
    n1 = idempotent_append(spark, batch, path, ["property", "date"])
    assert n1 == 2
    # re-running the same import is a no-op (P12 skip-if-present)
    n2 = idempotent_append(spark, batch, path, ["property", "date"])
    assert n2 == 0
    # a new slice still lands
    batch2 = spark.createDataFrame(
        [("p1", "2024-01-02", 3.0)], "property string, date string, v double"
    )
    assert idempotent_append(spark, batch2, path, ["property", "date"]) == 1
    assert spark.read.parquet(path).count() == 3
