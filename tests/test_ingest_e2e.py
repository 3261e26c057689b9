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
