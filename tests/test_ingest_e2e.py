"""End-to-end aggregation-side ingest: connector harness -> retry queue ->
idempotent append -> GSC enrichment (the §3.1 aggregation story), plus the
Sistrix position parse (S8)."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dawis_spark.functions.parsing import parse_int_or_null, parse_position
from dawis_spark.modules import get_module
from dawis_spark.operators.idempotent import idempotent_append
from dawis_spark.sources.connectors import FixtureConnector
from dawis_spark.streaming.retry import RetryQueue

GSC_SCHEMA = T.StructType(
    [
        T.StructField("property", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("page", T.StringType()),
        T.StructField("clicks", T.DoubleType()),
        T.StructField("impressions", T.DoubleType()),
    ]
)


def test_gsc_ingest_pipeline_e2e(spark, tmp_path):
    facts_path = str(tmp_path / "gsc_facts")

    flaky_calls = {"n": 0}

    def fetch(item):
        # one property is permanently down -> retry queue; the other returns rows
        if item["property"] == "down.example.de":
            flaky_calls["n"] += 1
            raise ConnectionError("api 500")
        return {
            "property": item["property"],
            "date": dt.date.fromisoformat(item["date"]),
            "page": "/shop/a.html",
            "clicks": 10.0,
            "impressions": 100.0,
        }

    connector = FixtureConnector(GSC_SCHEMA, fetch)
    rq = RetryQueue(str(tmp_path), "gsc")
    scheduled = [
        {"property": "ok.example.de", "date": "2026-05-01"},
        {"property": "down.example.de", "date": "2026-05-01"},
    ]
    items = rq.merge_with_scheduled(scheduled)
    staged, failed = connector.ingest(spark, items)

    # failed import -> retry queue; succeeded -> idempotent append
    rq.record_failures(failed)
    ok_items = [i for i in items if i["property"] == "ok.example.de"]
    rq.record_success(ok_items)
    n1 = idempotent_append(spark, staged, facts_path, ["property", "date"])
    assert n1 == 1
    assert rq.pending() == [{"property": "down.example.de", "date": "2026-05-01"}]
    assert flaky_calls["n"] == connector.max_retries  # per-item retry budget

    # re-running the same tick is a no-op (P12 idempotency)
    staged2, _ = connector.ingest(spark, ok_items)
    assert idempotent_append(spark, staged2, facts_path, ["property", "date"]) == 0

    # next day: new slice lands; enrichment + prev-period runs over facts
    staged3, _ = connector.ingest(
        spark, [{"property": "ok.example.de", "date": "2026-05-02"}]
    )
    idempotent_append(spark, staged3, facts_path, ["property", "date"])
    facts = spark.read.parquet(facts_path)
    enriched = get_module("gsc")(
        facts,
        {
            "matches": [
                {
                    "inputField": "page",
                    "outputField": "pagetype",
                    "fallback": "other",
                    "expressions": [{"csv": {"product": ["/shop/"]}}],
                }
            ],
            "previousPeriods": {
                "keys": ["property", "page"],
                "dateColumn": "date",
                "metrics": ["clicks"],
                "periods": ["Day"],
            },
        },
    )
    rows = {str(r["date"]): r for r in enriched.collect()}
    assert rows["2026-05-02"]["pagetype"] == "product"
    assert rows["2026-05-02"]["clicksPreviousDay"] == 10.0
    assert rows["2026-05-01"]["clicksPreviousDay"] is None


def test_render_hook_rewrites_body(spark):
    """Injectable headless-render path (reference html_parser.py:121-132):
    items with render=true get their body replaced by the renderer's
    output and the staged row's rendered flag set; others keep the
    fetched body."""
    from urllib.parse import urlparse

    from dawis_spark.schemas import HTML_DOC_SCHEMA

    def fetch(item):
        p = urlparse(item["url"])
        return {
            "urlset": "owndomains",
            "url": {
                "protocol": p.scheme,
                "domain": p.netloc,
                "path": p.path,
                "query": p.query or None,
            },
            "status_code": 200,
            "num_redirects": 0,
            "redirects": [],
            "ttfb": 0.1,
            "body": "<html>static</html>",
            "rendered": False,
            "date": dt.datetime(2026, 5, 1),
            "headers": {},
            "configuration_hash": "h",
        }

    rendered_urls = []

    def fake_renderer(url):
        rendered_urls.append(url)
        return "<html>js-rendered</html>"

    connector = FixtureConnector(HTML_DOC_SCHEMA, fetch, renderer=fake_renderer)
    staged, failed = connector.ingest(
        spark,
        [
            {"url": "https://e.de/a", "render": True},
            {"url": "https://e.de/b"},
        ],
    )
    assert failed == []
    rows = {r["url"]["path"]: r for r in staged.collect()}
    assert rows["/a"]["body"] == "<html>js-rendered</html>"
    assert rows["/a"]["rendered"] is True
    assert rows["/b"]["body"] == "<html>static</html>"
    assert rows["/b"]["rendered"] is False
    assert rendered_urls == ["https://e.de/a"]

    # renderer failure takes the fetch-retry path -> retry queue entry
    def broken_renderer(url):
        raise RuntimeError("chromedriver not configured")

    connector2 = FixtureConnector(HTML_DOC_SCHEMA, fetch, renderer=broken_renderer)
    staged2, failed2 = connector2.ingest(
        spark, [{"url": "https://e.de/a", "render": True}]
    )
    assert staged2.count() == 0 and len(failed2) == 1
    assert failed2[0]["attempts"] == connector2.max_retries


def test_sistrix_position_parse(spark):
    df = spark.createDataFrame(
        [("12",), (">100",), (None,), ("n/a",)], "pos string"
    )
    out = df.select(
        parse_position(F.col("pos")).alias("p"), parse_int_or_null(F.col("pos")).alias("t")
    ).collect()
    got = [(r["p"]["position"], r["p"]["positionOverflow"], r["t"]) for r in out]
    assert got == [
        (12, False, 12),      # numeric
        (100, True, None),    # overflow marker -> trailing digits + flag
        (None, False, None),  # NULL passthrough
        (None, None, None),   # unparseable -> flagged NULL, not an exception
    ]
