"""Comparison-DSL and check/alert semantics vs the reference's
utilities/parsing.py:4-55 and alerting_check.py:171-231."""

import pytest
from pyspark.sql import functions as F

from dawis_spark.operators.checks import (
    alerts_aggregate,
    alerts_per_line,
    check_rows,
    translate_comparison,
)


def _eval(spark, template, row: dict):
    df = spark.createDataFrame([row])
    return df.select(translate_comparison(template).alias("r")).first()["r"]


def test_numeric_comparisons(spark):
    assert _eval(spark, "{v} >= 10", {"v": 10}) is True
    assert _eval(spark, "{v} > 10", {"v": 10}) is False
    assert _eval(spark, "{v} < 10.5", {"v": 10.4}) is True
    assert _eval(spark, "{v} != 3", {"v": 4}) is True


def test_string_equality(spark):
    assert _eval(spark, "{t} == click", {"t": "click"}) is True
    assert _eval(spark, "{t} == click", {"t": "view"}) is False


def test_empty_placeholder(spark):
    # reference COMPERASION_PLACEHOLDERS: _empty -> ''
    assert _eval(spark, "{t} == _empty", {"t": ""}) is True
    assert _eval(spark, "{t} != _empty", {"t": "x"}) is True


def test_null_token_yields_null_not_true(spark):
    # 'null' coerces to None; == None is NULL in SQL (reference returns
    # False via Python eq — our boolean lands NULL; both are "not valid")
    assert _eval(spark, "{v} == null", {"v": 1}) is not True


def test_single_boolean_token(spark):
    assert _eval(spark, "true", {"v": 0}) is True
    assert _eval(spark, "false", {"v": 0}) is False
    assert _eval(spark, "{b}", {"b": True}) is True


def test_bad_template_raises(spark):
    with pytest.raises(SyntaxError):
        translate_comparison("{a} >=")
    with pytest.raises(SyntaxError):
        translate_comparison("{a} IN {b}")


def test_check_rows_shape(spark):
    df = spark.createDataFrame([{"id": 1, "v": 5.0}, {"id": 2, "v": 50.0}])
    out = check_rows(
        df,
        checks={"small": "{v} < 10"},
        value_cols={"small": "v"},
        key_cols=["id"],
    ).orderBy("id")
    rows = out.collect()
    assert [r["check"] for r in rows] == ["small", "small"]
    assert rows[0]["valid"] is True and rows[1]["valid"] is False
    assert rows[0]["value"] == "5.0"  # stringified (service/check.py:45)


def test_alert_fires_iff_check_xor_negate(spark):
    df = spark.createDataFrame([{"v": 100.0, "t": "a"}, {"v": 1.0, "t": "b"}])
    # negate=False: alert where check TRUE
    out = alerts_per_line(df, "{v} > 50", ["g1"], "val {v}", negate=False).collect()
    assert len(out) == 1 and out[0]["message"] == "val 100.0"
    # negate=True: alert where check FALSE
    out = alerts_per_line(df, "{v} > 50", ["g1"], "val {v}", negate=True).collect()
    assert len(out) == 1 and out[0]["message"] == "val 1.0"


def test_alert_per_group_fanout(spark):
    df = spark.createDataFrame([{"v": 100.0}])
    out = alerts_per_line(df, "{v} > 50", ["ops", "seo"], "m", negate=False)
    assert sorted(r["group"] for r in out.collect()) == ["ops", "seo"]


def test_aggregate_alert_empty_set_is_silent(spark):
    df = spark.createDataFrame([{"v": 1}]).filter(F.col("v") > 99)
    assert alerts_aggregate(df, ["g"], "n={resultsCount}").count() == 0


def test_aggregate_alert_counts(spark):
    df = spark.createDataFrame([{"v": 1}, {"v": 2}])
    rows = alerts_aggregate(df, ["g"], "n={resultsCount}").collect()
    assert rows[0]["message"] == "n=2"


def test_dq_suite_counts_and_flags(spark):
    from dawis_spark.operators.checks import dq_suite

    parent = spark.createDataFrame([(1,), (2,)], "id bigint")
    child = spark.createDataFrame([(1, 10), (3, 11), (3, 12)], "pid bigint, v bigint")
    checks = [
        (
            "child_pid_fk",
            child.join(parent.withColumnRenamed("id", "pid"), "pid", "left_anti"),
        ),
        ("parent_pk_unique",
         parent.groupBy("id").count().filter("count > 1")),
    ]
    out = {r["check_name"]: r for r in dq_suite(checks).collect()}
    assert out["child_pid_fk"]["n_violations"] == 2
    assert out["child_pid_fk"]["passed"] is False
    assert out["parent_pk_unique"]["n_violations"] == 0
    assert out["parent_pk_unique"]["passed"] is True
