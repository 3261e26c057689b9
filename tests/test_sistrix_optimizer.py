"""sistrix_optimizer (S8) — method-dependent schemas, request planning,
and both response pivots over fixture JSON bodies.

Reference semantics: modules/aggregation/custom/sistrix_optimizer.py
:48-131 (validation), :82-112 (schemas), :136-164 (requests),
:180-228 (visibility pivot), :230-273 (ranking pivot).
"""

import json
from datetime import date, datetime

import pytest
from pyspark.sql import types as T

from dawis_spark.modules.sistrix_domain import (
    ConfigurationInvalidError,
    ConfigurationMissingError,
)
from dawis_spark.modules.sistrix_optimizer import (
    DEFAULT_API_RANKING_LIMIT,
    ENDPOINT_OPTIMIZER_RANKING,
    ENDPOINT_OPTIMIZER_VISIBILITY,
    plan_requests,
    ranking_fact,
    schema_for_method,
    validate_configuration,
    visibility_fact,
)

_BASE_CFG = {
    "apiKey": "k",
    "projects": ["proj1", "proj2"],
    "method": "visibility",
}


def test_validation_required_keys_and_method_prefix():
    with pytest.raises(ConfigurationMissingError, match="API Key"):
        validate_configuration({"projects": ["p"], "method": "ranking"})
    with pytest.raises(ConfigurationMissingError, match="project"):
        validate_configuration({"apiKey": "k", "method": "ranking"})
    with pytest.raises(ConfigurationMissingError, match="method"):
        validate_configuration({"apiKey": "k", "projects": ["p"]})
    with pytest.raises(ConfigurationInvalidError, match='Invalid method "onpage.crawl"'):
        validate_configuration(
            {"apiKey": "k", "projects": ["p"], "method": "onpage.crawl"}
        )
    # 'optimizer.' prefix auto-added; already-prefixed passes through
    assert validate_configuration(_BASE_CFG)["method"] == ENDPOINT_OPTIMIZER_VISIBILITY
    assert (
        validate_configuration({**_BASE_CFG, "method": "optimizer.ranking"})["method"]
        == ENDPOINT_OPTIMIZER_RANKING
    )


def test_schema_selection_per_method_and_flags():
    vis = schema_for_method(ENDPOINT_OPTIMIZER_VISIBILITY)
    assert [f.name for f in vis] == ["request_date", "date", "source", "type", "value"]
    assert vis["request_date"].dataType == T.DateType()
    assert vis["value"] == T.StructField("value", T.DoubleType(), False)
    # datetime flags flip request_date / date independently
    vis_dt = schema_for_method(
        ENDPOINT_OPTIMIZER_VISIBILITY, use_datetime_request=True
    )
    assert vis_dt["request_date"].dataType == T.TimestampType()
    assert vis_dt["date"].dataType == T.DateType()
    # addParameterToTable grows the schema in the reference's order
    vis_add = schema_for_method(
        ENDPOINT_OPTIMIZER_VISIBILITY,
        add_parameters_to_table=["tag", "competitors"],
    )
    assert [f.name for f in vis_add][-2:] == ["tag", "competitors"]
    assert vis_add["tag"].nullable and not vis_add["competitors"].nullable
    rank = schema_for_method(ENDPOINT_OPTIMIZER_RANKING, use_datetime_api=True)
    assert [f.name for f in rank] == [
        "request_date", "keyword", "position", "positionOverflow", "url",
        "tags", "device", "country", "traffic", "searchengine",
    ]
    assert rank["position"].nullable and rank["traffic"].nullable
    # deviation-affected fields stay nullable (ADVICE r10): ranking_fact
    # emits NULL positionOverflow for junk positions, visibility_fact
    # NULL source/type for sourceless rows — the declared schema must
    # accept the pivot output it describes
    assert rank["positionOverflow"].nullable
    assert vis["source"].nullable and vis["type"].nullable


def test_plan_requests_per_project_and_ranking_limit():
    now = datetime(2026, 8, 12, 23, 30)  # Berlin day = Aug 13 from UTC
    plan = plan_requests(
        {**_BASE_CFG, "method": "ranking", "parameters": {"country": "de"}}, now
    )
    assert [p["project"] for p in plan] == ["proj1", "proj2"]
    assert all(p["limit"] == DEFAULT_API_RANKING_LIMIT for p in plan)
    assert all(p["country"] == "de" for p in plan)
    assert all(p["date"] == date(2026, 8, 13) for p in plan)
    # configured limit wins; visibility never injects one
    plan2 = plan_requests(
        {**_BASE_CFG, "method": "ranking", "parameters": {"limit": 5}}, now
    )
    assert all(p["limit"] == 5 for p in plan2)
    plan3 = plan_requests(_BASE_CFG, now)
    assert all("limit" not in p for p in plan3)


_VIS_BODY = json.dumps(
    {
        "answer": [
            {
                "optimizer.visibility": [
                    {"domain": "a.de", "date": "2026-08-10T00:00:00+02:00",
                     "value": "42.5", "tag": "brand"},
                    # url wins over host/path/domain (last-match-wins)
                    {"domain": "a.de", "host": "www.a.de", "path": "/x/",
                     "url": "https://www.a.de/x/", "date": "2026-08-10",
                     "value": 7},
                    # no source at all -> NULL source/type (flagged row)
                    {"date": "2026-08-10", "value": "1.0"},
                ]
            }
        ]
    }
)


def test_visibility_fact_pivot(spark):
    df = spark.createDataFrame([("proj1", _VIS_BODY)], ["project", "body"])
    rows = visibility_fact(
        df,
        date(2026, 8, 13),
        request_parameters={"competitors": True},
        add_parameters_to_table=["tag", "competitors"],
    ).collect()
    assert len(rows) == 3
    assert rows[0]["source"] == "a.de" and rows[0]["type"] == "domain"
    assert rows[0]["value"] == 42.5 and rows[0]["tag"] == "brand"
    assert rows[0]["date"] == date(2026, 8, 10)
    assert rows[0]["request_date"] == date(2026, 8, 13)
    assert rows[0]["competitors"] is True
    assert rows[1]["source"] == "https://www.a.de/x/" and rows[1]["type"] == "url"
    assert rows[1]["value"] == 7.0 and rows[1]["tag"] is None
    assert rows[2]["source"] is None and rows[2]["type"] is None
    # schema matches the method schema (minus nullability refinement)
    got = visibility_fact(
        df, date(2026, 8, 13), add_parameters_to_table=["tag"]
    )
    assert [f.name for f in got.schema] == [
        f.name
        for f in schema_for_method(
            ENDPOINT_OPTIMIZER_VISIBILITY, add_parameters_to_table=["tag"]
        )
    ]


_RANK_BODY = json.dumps(
    {
        "answer": [
            {
                "optimizer.rankings": [
                    {
                        "optimizer.ranking": [
                            {"keyword": "shoes", "position": 3, "url": "a.de/s",
                             "tags": "t1", "device": "desktop", "country": "de",
                             "traffic": 120, "searchengine": "google.de"},
                            {"keyword": "boots", "position": ">100",
                             "url": "a.de/b", "tags": "", "device": "mobile",
                             "country": "de", "traffic": "n/a",
                             "searchengine": "google.de"},
                            {"keyword": "socks", "position": None, "url": None,
                             "tags": "", "device": "desktop", "country": "de",
                             "searchengine": "google.de"},
                        ]
                    }
                ]
            }
        ]
    }
)


def test_ranking_fact_overflow_row(spark):
    df = spark.createDataFrame([("proj1", _RANK_BODY)], ["project", "body"])
    rows = {
        r["keyword"]: r
        for r in ranking_fact(df, date(2026, 8, 13)).collect()
    }
    assert rows["shoes"]["position"] == 3
    assert rows["shoes"]["positionOverflow"] is False
    assert rows["shoes"]["traffic"] == 120
    # THE overflow row: ">100" -> position 100, flag true
    assert rows["boots"]["position"] == 100
    assert rows["boots"]["positionOverflow"] is True
    assert rows["boots"]["traffic"] is None  # "n/a" is not numeric
    # API null position keeps overflow=false (distinct from junk)
    assert rows["socks"]["position"] is None
    assert rows["socks"]["positionOverflow"] is False
    assert rows["socks"]["request_date"] == date(2026, 8, 13)
    assert [f.name for f in ranking_fact(df, date(2026, 8, 13)).schema] == [
        f.name for f in schema_for_method(ENDPOINT_OPTIMIZER_RANKING)
    ]
