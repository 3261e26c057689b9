"""P11 validators, J6 url-dim upsert, S11 CSV match files."""

from pyspark.sql import functions as F

from dawis_spark.functions.validators import is_valid_email, is_valid_url
from dawis_spark.modules.gsc import load_match_csv
from dawis_spark.operators.urls_dim import resolve_url_ids, upsert_urls


def test_url_validator_matches_reference_cases(spark):
    cases = [
        ("https://www.example.de/a?x=1", True),
        ("http://localhost:8080/", True),
        ("http://127.0.0.1/x", True),
        ("ftp://example.com", False),
        ("not a url", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["ok"] for r in df.select(is_valid_url(F.col("u")).alias("ok")).collect()]
    assert got == [ok for _, ok in cases]


def test_email_validator(spark):
    cases = [("a.b+c@example.de", True), ("nope@", False), ("@x.de", False)]
    df = spark.createDataFrame([(e,) for e, _ in cases], "e string")
    got = [r["ok"] for r in df.select(is_valid_email(F.col("e")).alias("ok")).collect()]
    assert got == [ok for _, ok in cases]


def _urls(spark, paths):
    return spark.createDataFrame(
        [("https", "e.de", p, "") for p in paths],
        "protocol string, domain string, path string, query string",
    )


def test_urls_dim_upsert_stable_ids(spark, tmp_path):
    dim_path = str(tmp_path / "urls_dim")
    d1 = upsert_urls(spark, _urls(spark, ["/a", "/b"]), dim_path)
    ids1 = {r["path"]: r["url_id"] for r in d1.collect()}
    assert sorted(ids1.values()) == [1, 2]
    # second batch: existing keep ids, new ones get ids above max
    d2 = upsert_urls(spark, _urls(spark, ["/b", "/c"]), dim_path)
    ids2 = {r["path"]: r["url_id"] for r in d2.collect()}
    assert ids2["/a"] == ids1["/a"] and ids2["/b"] == ids1["/b"]
    assert ids2["/c"] == 3
    # re-running the same batch inserts nothing (idempotent)
    d3 = upsert_urls(spark, _urls(spark, ["/c"]), dim_path)
    assert d3.count() == 3


def test_resolve_url_ids_fk_join(spark, tmp_path):
    dim_path = str(tmp_path / "urls_dim")
    dim = upsert_urls(spark, _urls(spark, ["/a"]), dim_path)
    checks = spark.createDataFrame(
        [("c1", {"protocol": "https", "domain": "e.de", "path": "/a", "query": ""})],
        "check string, url struct<protocol:string,domain:string,path:string,query:string>",
    )
    out = resolve_url_ids(checks, dim).first()
    assert out["url_id"] == 1 and out["check"] == "c1"


def test_load_match_csv_shape(spark, tmp_path):
    p = tmp_path / "matches.csv"
    p.write_text('"TEST","F00"\n"/a.html","/b.html"\n"/c.html",\n')
    out = load_match_csv(spark, str(p))
    assert out == {"TEST": ["/a.html", "/c.html"], "F00": ["/b.html"]}
