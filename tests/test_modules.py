"""Operation modules over FIXTURES.md-shaped staging frames."""

import datetime as dt

from pyspark.sql import functions as F

from dawis_spark.modules import get_module
from dawis_spark.schemas import HTML_DOC_SCHEMA, ROBOTSTXT_DOC_SCHEMA


def _url(path):
    return {"protocol": "https", "domain": "www.example.de", "path": path, "query": ""}


def _html_doc(path, body, headers=None, date=None, status=200):
    return {
        "urlset": "owndomains",
        "url": _url(path),
        "status_code": status,
        "num_redirects": 0,
        "redirects": [],
        "ttfb": 10.0,
        "body": body,
        "rendered": False,
        "date": date or dt.datetime(2026, 5, 1),
        "headers": headers or {},
        "configuration_hash": "h",
    }


def _checks(df):
    return {
        (r["check"], r["url"]["path"]): r
        for r in df.collect()
    }


def test_responseheader_checks(spark):
    docs = spark.createDataFrame(
        [
            _html_doc("/a.html", "", {"Content-Encoding": "GZIP", "Cache-Control": "max-age=60"}),
            _html_doc("/b.html", "", {}, status=404),
        ],
        HTML_DOC_SCHEMA,
    )
    out = get_module("responseheader")(
        docs,
        {
            "status_code": {"assert": 200},
            "content_encoding": {"assert": "gzip"},
            "cache_control": {"assert": "max-age=60"},
        },
    )
    c = _checks(out)
    assert c[("responseheader-status_code", "/a.html")]["valid"] is True
    assert c[("responseheader-status_code", "/b.html")]["valid"] is False
    # mixed-case header keys+values normalized (P8)
    assert c[("responseheader-content_encoding", "/a.html")]["valid"] is True
    assert c[("responseheader-content_encoding", "/b.html")]["valid"] is False
    assert c[("responseheader-cache_control", "/a.html")]["valid"] is True


HTML_OK = "<html><head><title>Nice Title</title><meta name='description' content='desc one'/><link rel='canonical' href='https://www.example.de/a.html'/></head><body><h1>One</h1></body></html>"
HTML_NO_TITLE = "<html><head></head><body><h1>x</h1><h1>y</h1></body></html>"
HTML_EMPTY_TITLE = "<html><head><title> </title></head><body></body></html>"
HTML_MULTI_TITLE = "<html><head><title>a</title><title>b</title></head><body></body></html>"


def test_metatags_has_title_and_empty_and_multi(spark):
    docs = spark.createDataFrame(
        [
            _html_doc("/a.html", HTML_OK),
            _html_doc("/no.html", HTML_NO_TITLE),
            _html_doc("/empty.html", HTML_EMPTY_TITLE),
            _html_doc("/multi.html", HTML_MULTI_TITLE),
        ],
        HTML_DOC_SCHEMA,
    )
    out = get_module("metatags")(
        docs,
        {
            "title": {
                "has_title": True,
                "is_title_empty": False,
                "problem_multi": True,
            }
        },
    )
    c = _checks(out)
    assert c[("metatags-has_title", "/a.html")]["valid"] is True
    assert c[("metatags-has_title", "/a.html")]["value"] == "Nice Title"
    no = c[("metatags-has_title", "/no.html")]
    assert no["valid"] is False and no["error"] == "title missing"
    assert c[("metatags-is_title_empty", "/empty.html")]["valid"] is False
    assert c[("metatags-is_title_empty", "/a.html")]["valid"] is True
    multi = c[("metatags-problem-multi-title", "/multi.html")]
    assert multi["valid"] is False and multi["value"] == "2"
    # multi-title doc excluded from the has_title branch (reference gate)
    assert ("metatags-has_title", "/multi.html") not in c


def test_metatags_change_detection(spark):
    t1 = "<html><head><title>Old</title></head><body></body></html>"
    t2 = "<html><head><title>New</title></head><body></body></html>"
    docs = spark.createDataFrame(
        [
            _html_doc("/a.html", t1, date=dt.datetime(2026, 5, 1)),
            _html_doc("/a.html", t2, date=dt.datetime(2026, 5, 2)),
            _html_doc("/b.html", t1, date=dt.datetime(2026, 5, 1)),
            _html_doc("/b.html", t1, date=dt.datetime(2026, 5, 2)),
        ],
        HTML_DOC_SCHEMA,
    )
    out = get_module("metatags")(docs, {"title": {"has_title_changed": False}})
    c = _checks(out)
    a = c[("metatags-has_title_changed", "/a.html")]
    assert a["valid"] is False and a["value"] == "New" and a["diff"] == "Old"
    b = c[("metatags-has_title_changed", "/b.html")]
    assert b["valid"] is True  # unchanged == assert(False)


def test_metatags_duplicates_diff_format(spark):
    same = "<html><head><title>Same Title</title></head><body></body></html>"
    uniq = "<html><head><title>Unique</title></head><body></body></html>"
    docs = spark.createDataFrame(
        [
            _html_doc("/a.html", same),
            _html_doc("/b.html", same),
            _html_doc("/c.html", uniq),
        ],
        HTML_DOC_SCHEMA,
    )
    out = get_module("metatags")(docs, {"title": {"has_title_duplicates": False}})
    c = _checks(out)
    a = c[("metatags-has_title_duplicates", "/a.html")]
    assert a["valid"] is False
    assert a["diff"] == "https://www.example.de/b.html"
    assert a["error"] == "title duplicates in url-set detected"
    assert c[("metatags-has_title_duplicates", "/c.html")]["valid"] is True


def test_metatags_canonical_self_reference(spark):
    docs = spark.createDataFrame(
        [_html_doc("/a.html", HTML_OK), _html_doc("/no.html", HTML_NO_TITLE)],
        HTML_DOC_SCHEMA,
    )
    # legacy boolean grammar maps to the self-referencing check
    out = get_module("metatags")(docs, {"canonical": True})
    c = _checks(out)
    assert c[("metatags-canonical_is_self_referencing", "/a.html")]["valid"] is True
    bad = c[("metatags-canonical_is_self_referencing", "/no.html")]
    assert bad["valid"] is False and bad["error"] == "canonical missing"


HTML_FOREIGN_CANONICAL = (
    "<html><head><link rel='canonical' href='https://other.de/x.html'/>"
    "</head><body></body></html>"
)
HTML_TWO_CANONICALS = (
    "<html><head><link rel='canonical' href='https://first.de/1.html'/>"
    "<link rel='canonical' href='https://www.example.de/two.html'/>"
    "</head><body></body></html>"
)


def test_metatags_has_canonical_family(spark):
    docs = spark.createDataFrame(
        [
            _html_doc("/a.html", HTML_OK),
            _html_doc("/no.html", HTML_NO_TITLE),
            _html_doc("/foreign.html", HTML_FOREIGN_CANONICAL),
            _html_doc("/two.html", HTML_TWO_CANONICALS),
        ],
        HTML_DOC_SCHEMA,
    )
    cfg = {"canonical": {"has_canonical": True, "canonical_is_self_referencing": True}}
    c = _checks(get_module("metatags")(docs, cfg))
    # has_canonical: valid iff a canonical exists (reference quirk: the
    # assert can only pass when one exists)
    assert c[("metatags-has_canonical", "/a.html")]["valid"] is True
    missing = c[("metatags-has_canonical", "/no.html")]
    assert missing["valid"] is False and missing["error"] == "no canonical"
    assert c[("metatags-has_canonical", "/foreign.html")]["valid"] is True
    # last <link rel=canonical> wins (reference get_canonical_href loop)
    two = c[("metatags-canonical_is_self_referencing", "/two.html")]
    assert two["value"] == "https://www.example.de/two.html"
    assert two["valid"] is True
    # foreign canonical: exists but not self-referencing
    foreign = c[("metatags-canonical_is_self_referencing", "/foreign.html")]
    assert foreign["valid"] is False and foreign["value"] == "https://other.de/x.html"


def test_metatags_canonical_href_200_probe(spark):
    """The live 200-probe routed through the connector harness: a
    FixtureConnector stands in for HTTP and produces (href, status_code)."""
    from pyspark.sql import types as T

    from dawis_spark.sources.connectors import FixtureConnector

    statuses = {"https://www.example.de/a.html": 200, "https://other.de/x.html": 404}
    probe_schema = T.StructType(
        [
            T.StructField("href", T.StringType(), False),
            T.StructField("status_code", T.IntegerType(), False),
        ]
    )
    connector = FixtureConnector(
        probe_schema,
        lambda item: {"href": item["href"], "status_code": statuses[item["href"]]},
    )
    probes, failed = connector.ingest(
        spark, [{"href": h} for h in sorted(statuses)]
    )
    assert not failed
    docs = spark.createDataFrame(
        [
            _html_doc("/a.html", HTML_OK),
            _html_doc("/foreign.html", HTML_FOREIGN_CANONICAL),
            _html_doc("/no.html", HTML_NO_TITLE),
        ],
        HTML_DOC_SCHEMA,
    )
    cfg = {"canonical": {"canonical_href_200": True}}
    c = _checks(get_module("metatags")(docs, cfg, probes=probes))
    assert c[("metatags-canonical_href_200", "/a.html")]["valid"] is True
    bad = c[("metatags-canonical_href_200", "/foreign.html")]
    assert bad["valid"] is False and bad["error"] == "href in canonical not valid"
    # no canonical: probe result False == assert True -> invalid, no error
    none = c[("metatags-canonical_href_200", "/no.html")]
    assert none["valid"] is False and none["error"] == ""
    # probes are mandatory for this check
    import pytest as _pytest

    with _pytest.raises(ValueError, match="probe"):
        get_module("metatags")(docs, cfg)


def test_htmlheadings_h1_count(spark):
    docs = spark.createDataFrame(
        [_html_doc("/a.html", HTML_OK), _html_doc("/no.html", HTML_NO_TITLE)],
        HTML_DOC_SCHEMA,
    )
    out = get_module("htmlheadings")(docs, {"count_headline_h1": {"assert": 1}})
    c = _checks(out)
    assert c[("htmlheadings-count_headline_h1", "/a.html")]["valid"] is True
    bad = c[("htmlheadings-count_headline_h1", "/no.html")]
    assert bad["valid"] is False and bad["value"] == "2"


def _robots_doc(path, body, status=200):
    return {
        "urlset": "robotstxtcheck",
        "url": _url(path),
        "status_code": status,
        "body": body,
        "headers": {},
        "date": dt.datetime(2026, 5, 1),
    }


def test_robotstxt_checks(spark):
    docs = spark.createDataFrame(
        [
            _robots_doc("/robots.txt", "User-agent: *\nSitemap: https://www.example.de/sitemap.xml"),
            _robots_doc("/robots.txt2", "User-agent: *", status=404),
        ],
        ROBOTSTXT_DOC_SCHEMA,
    )
    probed = spark.createDataFrame(
        [("https://www.example.de/sitemap.xml", 200)], "url string, status_code int"
    )
    out = get_module("robotstxt")(
        docs, {"status_code": {"assert": 200}, "has_sitemap_xml": True}, probed=probed
    )
    c = _checks(out)
    assert c[("robotstxt-status_code", "/robots.txt")]["valid"] is True
    assert c[("robotstxt-status_code", "/robots.txt2")]["valid"] is False
    assert c[("robotstxt-has_sitemap_xml", "/robots.txt")]["valid"] is True
    assert c[("robotstxt-has_sitemap_xml", "/robots.txt2")]["valid"] is False
    alive = c[("robotstxt-sitemap_alive", "/robots.txt")]
    assert alive["valid"] is True and alive["value"].endswith("sitemap.xml")


def test_pagespeed_json_path_checks(spark):
    body_ok = '{"lighthouseResult":{"categories":{"performance":{"score":0.91}},"audits":{"uses-text-compression":{"score":1}}}}'
    body_bad = '{"lighthouseResult":{"categories":{"performance":{"score":0.31}},"audits":{}}}'
    docs = spark.createDataFrame(
        [
            {"urlset": "u", "url": _url("/a.html"), "strategy": "DESKTOP", "body": body_ok},
            {"urlset": "u", "url": _url("/b.html"), "strategy": "MOBILE", "body": body_bad},
        ],
        "urlset string, url struct<protocol:string,domain:string,path:string,query:string>, strategy string, body string",
    )
    out = get_module("pagespeed")(
        docs,
        {
            "performance_score": "{v} >= 0.5",
            "audits": {"uses-text-compression": "{v} == 1"},
        },
    )
    c = _checks(out)
    assert c[("pagespeed-performance_score", "/a.html")]["valid"] is True
    assert c[("pagespeed-performance_score", "/b.html")]["valid"] is False
    assert c[("pagespeed-uses-text-compression", "/a.html")]["valid"] is True
    miss = c[("pagespeed-uses-text-compression", "/b.html")]
    assert miss["valid"] is False and miss["error"] == "score missing"


def test_gsc_pipeline_enrich_and_prev_period(spark):
    import datetime as dtm

    rows = [
        ("p", dtm.date(2026, 5, 1), "web", "/shop/x.html", 10.0, 100.0),
        ("p", dtm.date(2026, 5, 2), "web", "/shop/x.html", 20.0, 200.0),
        ("p", dtm.date(2026, 5, 2), "web", "/blog/y.pdf", 5.0, 50.0),
    ]
    df = spark.createDataFrame(
        rows, "property string, date date, searchType string, page string, clicks double, impressions double"
    )
    from dawis_spark.modules.gsc import default_match_expressions

    out = get_module("gsc")(
        df,
        {
            "excludeInputFields": ["searchType", "date"],  # date must survive
            "matches": [
                {
                    "inputField": "page",
                    "outputField": "pagetype",
                    "fallback": "other",
                    "expressions": default_match_expressions(),
                }
            ],
            "previousPeriods": {
                "keys": ["property", "page"],
                "dateColumn": "date",
                "metrics": ["clicks", "impressions"],
                "periods": ["Day"],
            },
        },
    )
    assert "searchType" not in out.columns and "date" in out.columns
    rows = {(r["page"], str(r["date"])): r for r in out.collect()}
    # csv match overwrites the .html regex label (reference ordering)
    assert rows[("/shop/x.html", "2026-05-02")]["pagetype"] == "product"
    assert rows[("/blog/y.pdf", "2026-05-02")]["pagetype"] == "blog"
    assert rows[("/shop/x.html", "2026-05-02")]["clicksPreviousDay"] == 10.0
    assert rows[("/shop/x.html", "2026-05-01")]["clicksPreviousDay"] is None
