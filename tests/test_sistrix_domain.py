"""sistrix_domain import logic — gates, matrix, Berlin day, wide fact.

Reference semantics: modules/aggregation/custom/sistrix_domain.py:58-229
(request configuration), :260-287 (response parses), :314-336 (schema).
"""

import json
from datetime import datetime, timezone

import pytest

from dawis_spark.modules.sistrix_domain import (
    ConfigurationInvalidError,
    ConfigurationMissingError,
    ENDPOINT_DOMAIN_PAGES,
    ENDPOINT_DOMAIN_VISIBILITYINDEX,
    berlin_request_date,
    domain_fact,
    field_type,
    normalize_methods,
    plan_requests,
    validate_targets,
    weekday_passes,
)

_METHODS_CFG = [
    {"method": "sichtbarkeitsindex", "fieldName": "visibility"},
    {"method": "pages", "fieldName": "pageCount"},
    {"method": "kwcount.seo", "fieldName": "kwTotal"},
    {"method": "kwcount.seo.top10", "fieldName": "kwTop10"},
]


def test_target_mutual_exclusion():
    with pytest.raises(ConfigurationInvalidError, match="parallel"):
        validate_targets({"domain": "a.de", "host": "www.a.de"})
    with pytest.raises(ConfigurationInvalidError, match="You need one"):
        validate_targets({})
    assert validate_targets({"domain": "a.de"}) == [("domain", "a.de")]
    assert validate_targets({"paths": ["a.de/x/", "a.de/y/"]}) == [
        ("path", "a.de/x/"),
        ("path", "a.de/y/"),
    ]


def test_method_normalization_and_daily_injection():
    methods, daily = normalize_methods({"methods": _METHODS_CFG})
    assert daily is True
    byname = {m["fieldName"]: m for m in methods}
    # 'domain.' prefix auto-added
    assert byname["visibility"]["method"] == ENDPOINT_DOMAIN_VISIBILITYINDEX
    # daily injected ONLY into visibility-index methods
    assert byname["visibility"]["parameters"] == {"daily": True}
    assert byname["pageCount"]["parameters"] == {}
    # weekday-gated config -> daily=False
    methods2, daily2 = normalize_methods(
        {"methods": _METHODS_CFG, "onlyOnWeekday": "Mon"}
    )
    assert daily2 is False
    assert {m["fieldName"]: m for m in methods2}["visibility"]["parameters"] == {
        "daily": False
    }


def test_method_validation_errors():
    with pytest.raises(ConfigurationInvalidError, match="not allowed"):
        normalize_methods({"methods": [{"method": "domain.age", "fieldName": "x"}]})
    with pytest.raises(ConfigurationMissingError, match="field name"):
        normalize_methods({"methods": [{"method": "pages"}]})
    with pytest.raises(ConfigurationInvalidError, match='parameter "mobile"'):
        normalize_methods(
            {"methods": [{"method": "pages", "fieldName": "p", "parameters": {"mobile": True}}]}
        )
    with pytest.raises(ConfigurationMissingError, match="Missing methods"):
        normalize_methods({"methods": []})


def test_weekday_gate_accepts_all_three_forms():
    wed = datetime(2026, 8, 12, 9, 0)  # a Wednesday
    assert weekday_passes("Wed", wed)
    assert weekday_passes("Wednesday", wed)
    assert weekday_passes(3, wed)
    assert not weekday_passes("Thu", wed)
    assert not weekday_passes(4, wed)
    assert weekday_passes(None, wed)


def test_berlin_day_normalization():
    # 23:30 UTC on Jun 1 is already Jun 2 in Berlin (CEST, UTC+2)
    late = datetime(2026, 6, 1, 23, 30, tzinfo=timezone.utc)
    assert str(berlin_request_date(late)) == "2026-06-02"
    # winter (CET, UTC+1): 22:30 UTC Jan 5 is still Jan 5 Berlin... 23:30 is Jan 6
    assert str(berlin_request_date(datetime(2026, 1, 5, 22, 30, tzinfo=timezone.utc))) == "2026-01-05"
    assert str(berlin_request_date(datetime(2026, 1, 5, 23, 30, tzinfo=timezone.utc))) == "2026-01-06"


def test_plan_requests_matrix_and_gate():
    cfg = {"domain": "a.de", "methods": _METHODS_CFG, "onlyOnWeekday": "Tue"}
    wed = datetime(2026, 8, 12, 9, 0, tzinfo=timezone.utc)
    assert plan_requests(cfg, wed) is None  # gate skips
    tue = datetime(2026, 8, 11, 9, 0, tzinfo=timezone.utc)
    plan, req_date = plan_requests(cfg, tue)
    assert len(plan) == 4  # 1 target x 4 methods
    assert str(req_date) == "2026-08-11"
    cfg2 = {"paths": ["a.de/x/", "a.de/y/"], "methods": _METHODS_CFG}
    plan2, _ = plan_requests(cfg2, tue)
    assert len(plan2) == 8  # 2 targets x 4 methods


def _body(key: str, value) -> str:
    return json.dumps({"answer": [{key: [{"value": value}]}]})


def test_domain_fact_wide_row_with_types(spark):
    methods, _ = normalize_methods({"methods": _METHODS_CFG})
    rows = [
        ("domain", "a.de", "domain.sichtbarkeitsindex", "visibility",
         _body("sichtbarkeitsindex", "12.34")),
        ("domain", "a.de", "domain.pages", "pageCount", _body("pages", "1500")),
        ("domain", "a.de", "domain.kwcount.seo", "kwTotal", _body("kwcount.seo", 420)),
        ("domain", "a.de", "domain.kwcount.seo.top10", "kwTop10",
         _body("kwcount.seo.top10", 37)),
    ]
    responses = spark.createDataFrame(
        rows, "target_kind string, target string, method string, fieldName string, body string"
    )
    from datetime import date

    fact = domain_fact(responses, methods, date(2026, 8, 11))
    assert fact.count() == 1
    row = fact.collect()[0]
    assert row["visibility"] == pytest.approx(12.34)
    assert row["pageCount"] == 1500 and row["kwTop10"] == 37
    assert str(row["date"]) == "2026-08-11"
    dtypes = dict(fact.dtypes)
    assert dtypes["visibility"] == "double"
    assert dtypes["pageCount"] == "bigint"
    assert dtypes["date"] == "date"


def test_domain_fact_parameters_in_result(spark):
    cfg = {
        "methods": [
            {"method": "sichtbarkeitsindex", "fieldName": "visibility",
             "parameters": {"mobile": True, "country": "de"}},
        ],
    }
    methods, _ = normalize_methods(cfg)
    responses = spark.createDataFrame(
        [("domain", "a.de", "domain.sichtbarkeitsindex", "visibility",
          _body("sichtbarkeitsindex", "7.5"))],
        "target_kind string, target string, method string, fieldName string, body string",
    )
    from datetime import date

    fact = domain_fact(responses, methods, date(2026, 8, 11), add_parameters_to_result=True)
    row = fact.collect()[0]
    assert row["__value"] == "7.5" and row["fieldName"] == "visibility"
    assert row["mobile"] is True and row["daily"] is True and row["country"] == "de"
    dtypes = dict(fact.dtypes)
    assert dtypes["mobile"] == "boolean" and dtypes["country"] == "string"


def test_field_type_schema_mapping():
    methods, _ = normalize_methods({"methods": _METHODS_CFG})
    from pyspark.sql import types as T

    assert field_type("visibility", methods) == T.DoubleType()
    assert field_type("pageCount", methods) == T.LongType()
    assert field_type("date", methods) == T.DateType()
    assert field_type("daily", methods) == T.BooleanType()
    assert field_type("mystery", methods) == T.StringType()
