"""GA filter clause translation + report request builder.

Reference: google_analytics.py:384-479 (passthrough into batchGet);
translation semantics follow the public Reporting v4 filter grammar.
"""

from datetime import date

import pytest

from dawis_spark.modules.google_analytics import (
    apply_filter_clauses,
    build_report_request,
    filter_clauses_predicate,
)


@pytest.fixture()
def ga_rows(spark):
    rows = [
        ("DE", "google / organic", "10", "2.5"),
        ("de", "bing / cpc", "3", "0.0"),
        ("FR", "google / cpc", "25", "9.9"),
        ("US", "(direct) / (none)", None, "1.0"),
    ]
    return spark.createDataFrame(
        rows, "country string, sourceMedium string, sessions string, bounceRate string"
    )


def _countries(df):
    return sorted(r["country"] for r in df.collect())


def test_dimension_exact_case_insensitive_default(ga_rows):
    clause = {"filters": [{"dimensionName": "ga:country", "operator": "EXACT",
                           "expressions": ["de"]}]}
    assert _countries(apply_filter_clauses(ga_rows, clause)) == ["DE", "de"]
    # caseSensitive flips it
    clause_cs = {"filters": [{"dimensionName": "ga:country", "operator": "EXACT",
                              "expressions": ["de"], "caseSensitive": True}]}
    assert _countries(apply_filter_clauses(ga_rows, clause_cs)) == ["de"]


def test_dimension_operators(ga_rows):
    begins = {"filters": [{"dimensionName": "sourceMedium", "operator": "BEGINS_WITH",
                           "expressions": ["Google"]}]}
    assert _countries(apply_filter_clauses(ga_rows, begins)) == ["DE", "FR"]
    partial = {"filters": [{"dimensionName": "sourceMedium", "operator": "PARTIAL",
                            "expressions": ["cpc"]}]}
    assert _countries(apply_filter_clauses(ga_rows, partial)) == ["FR", "de"]
    regexp = {"filters": [{"dimensionName": "sourceMedium", "operator": "REGEXP",
                           "expressions": ["^GOOGLE.*organic$"]}]}
    assert _countries(apply_filter_clauses(ga_rows, regexp)) == ["DE"]
    in_list = {"filters": [{"dimensionName": "country", "operator": "IN_LIST",
                            "expressions": ["fr", "us"]}]}
    assert _countries(apply_filter_clauses(ga_rows, in_list)) == ["FR", "US"]
    negated = {"filters": [{"dimensionName": "country", "operator": "IN_LIST",
                            "expressions": ["fr", "us"], "not": True}]}
    assert _countries(apply_filter_clauses(ga_rows, negated)) == ["DE", "de"]


def test_metric_filters_and_clause_operators(ga_rows):
    gt = {"filters": [{"metricName": "ga:sessions", "operator": "GREATER_THAN",
                       "comparisonValue": "5"}]}
    assert _countries(apply_filter_clauses(ga_rows, None, gt)) == ["DE", "FR"]
    missing = {"filters": [{"metricName": "sessions", "operator": "IS_MISSING"}]}
    assert _countries(apply_filter_clauses(ga_rows, None, missing)) == ["US"]
    # OR is the default within a clause
    or_clause = {"filters": [
        {"metricName": "sessions", "operator": "EQUAL", "comparisonValue": "3"},
        {"metricName": "bounceRate", "operator": "GREATER_THAN", "comparisonValue": "9"},
    ]}
    assert _countries(apply_filter_clauses(ga_rows, None, or_clause)) == ["FR", "de"]
    and_clause = {"operator": "AND", "filters": [
        {"metricName": "sessions", "operator": "GREATER_THAN", "comparisonValue": "1"},
        {"metricName": "bounceRate", "operator": "GREATER_THAN", "comparisonValue": "1"},
    ]}
    assert _countries(apply_filter_clauses(ga_rows, None, and_clause)) == ["DE", "FR"]


def test_dimension_and_metric_clauses_combine_with_and(ga_rows):
    dim = {"filters": [{"dimensionName": "sourceMedium", "operator": "PARTIAL",
                        "expressions": ["google"]}]}
    met = {"filters": [{"metricName": "sessions", "operator": "GREATER_THAN",
                        "comparisonValue": "20"}]}
    assert _countries(apply_filter_clauses(ga_rows, dim, met)) == ["FR"]
    # list-of-clauses form ANDs the clauses
    two = [
        {"filters": [{"dimensionName": "country", "operator": "IN_LIST",
                      "expressions": ["de", "fr"]}]},
        {"filters": [{"dimensionName": "sourceMedium", "operator": "PARTIAL",
                      "expressions": ["organic"]}]},
    ]
    assert _countries(apply_filter_clauses(ga_rows, two)) == ["DE"]


def test_unknown_operator_raises(ga_rows):
    bad = {"filters": [{"dimensionName": "country", "operator": "FUZZY",
                        "expressions": ["x"]}]}
    with pytest.raises(ValueError, match="FUZZY"):
        filter_clauses_predicate(bad)


def test_build_report_request_matches_reference_layout():
    body = build_report_request(
        123,
        ["ga:date", "ga:country"],
        ["ga:sessions"],
        date(2026, 8, 10),
        segment_id="gaid::-5",
        dimension_filter_clauses={"filters": []},
        page_token="200000",
    )
    report = body["reportRequests"][0]
    assert report["viewId"] == "123"
    assert report["samplingLevel"] == "LARGE"
    assert report["dimensions"] == [{"name": "ga:date"}, {"name": "ga:country"}]
    assert report["metrics"] == [{"expression": "ga:sessions"}]
    assert report["dateRanges"] == [
        {"startDate": "2026-08-10", "endDate": "2026-08-10"}
    ]
    assert report["pageSize"] == 100000
    assert report["pageToken"] == "200000"
    assert report["segments"] == [{"segmentId": "gaid::-5"}]
    assert report["dimensionFilterClauses"] == {"filters": []}
    assert "metricFilterClauses" not in report
