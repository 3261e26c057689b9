"""Schema inferencers and URL struct helpers."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dawis_spark.functions.urls import assemble_url, parse_url_struct, robotstxt_url
from dawis_spark.schemas import infer_ga_schema, infer_gsc_schema


def test_gsc_name_convention_typing():
    s = infer_gsc_schema(
        ["property", "date", "clicks", "impressionsPreviousDay", "query", "position"]
    )
    by = {f.name: f for f in s.fields}
    assert isinstance(by["clicks"].dataType, T.DoubleType)
    assert isinstance(by["position"].dataType, T.DoubleType)
    assert isinstance(by["date"].dataType, T.DateType)
    assert isinstance(by["query"].dataType, T.StringType)
    # nullable iff 'Previous' in name (google_search_console.py:505-513)
    assert by["impressionsPreviousDay"].nullable is True
    assert by["clicks"].nullable is False


def test_ga_membership_typing():
    s = infer_ga_schema(
        ["ga:date", "ga:deviceCategory"], ["ga:sessions", "ga:percentNewSessions"]
    )
    by = {f.name: f for f in s.fields}
    assert isinstance(by["sessions"].dataType, T.LongType)
    assert isinstance(by["percentNewSessions"].dataType, T.DoubleType)
    assert isinstance(by["date"].dataType, T.DateType)
    assert "ga:sessions" not in by  # prefix stripped


def test_url_roundtrip(spark):
    df = spark.createDataFrame(
        [("https://www.example.de/a/b.html?x=1",), ("http://example.com/",)],
        "u string",
    )
    out = df.select(
        parse_url_struct(F.col("u")).alias("s")
    ).select(assemble_url(F.col("s")).alias("back"), "s")
    rows = out.collect()
    assert rows[0]["back"] == "https://www.example.de/a/b.html?x=1"
    assert rows[0]["s"]["protocol"] == "https"
    assert rows[0]["s"]["domain"] == "www.example.de"
    assert rows[1]["back"] == "http://example.com/"


def test_robotstxt_rewrite(spark):
    df = spark.createDataFrame([("https://www.example.de/deep/page.html?q=1",)], "u string")
    out = df.select(robotstxt_url(parse_url_struct(F.col("u"))).alias("r")).first()
    assert out["r"] == "https://www.example.de/robots.txt"
