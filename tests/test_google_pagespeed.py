"""google_pagespeed v2 extraction — fixture JSON -> nested fact record.

Mirrors reference google_pagespeed.py:345-487 semantics: full labdata +
CrUX records, origin_fallback suppression, validation -> error column.
"""

import json

import pytest

from dawis_spark.modules.google_pagespeed import extract_psi, psi_facts


def _crux(seed: int) -> dict:
    metrics = {}
    for i, key in enumerate(
        (
            "CUMULATIVE_LAYOUT_SHIFT_SCORE",
            "LARGEST_CONTENTFUL_PAINT_MS",
            "FIRST_CONTENTFUL_PAINT_MS",
            "FIRST_INPUT_DELAY_MS",
        )
    ):
        metrics[key] = {
            "percentile": seed * 100 + i,
            "distributions": [
                {"proportion": 0.5},
                {"proportion": 0.3},
                {"proportion": 0.2},
            ],
        }
    return {"metrics": metrics}


def _body(seed: int = 1, le: bool = True, fallback: bool = False) -> str:
    audits = {
        "cumulative-layout-shift": {"numericValue": 0.01 * seed},
        "largest-contentful-paint": {"numericValue": 1200.0 + seed},
        "first-contentful-paint": {"numericValue": 800.0 + seed},
        "total-blocking-time": {"numericValue": 150.0 + seed},
        "max-potential-fid": {"numericValue": 90.0 + seed},
        "server-response-time": {"numericValue": 120.0 + seed, "score": 1},
        "uses-text-compression": {"score": 1},
        "uses-long-cache-ttl": {"score": 0.5},
        "dom-size": {"score": 1},
        "offscreen-images": {"score": 1},
        "uses-optimized-images": {"score": 1},
        "uses-responsive-images": {"score": 1},
        "render-blocking-resources": {"score": 0},
        "bootup-time": {"score": 1},
        "mainthread-work-breakdown": {"score": 1},
        "network-requests": {"details": {"items": [{"statusCode": 200}]}},
    }
    body = {
        "analysisUTCTimestamp": "2026-02-03T10:30:00.000Z",
        "lighthouseResult": {
            "audits": audits,
            "categories": {"performance": {"score": 0.93}},
        },
        "originLoadingExperience": _crux(seed),
    }
    if le:
        body["loadingExperience"] = _crux(seed + 1)
        if fallback:
            body["loadingExperience"]["origin_fallback"] = True
    return json.dumps(body)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "url string, cluster string, strategy string, body string"
    )


def test_extract_full_record(spark):
    docs = _docs(spark, [("https://a.de/", "c1", "desktop", _body(2))])
    row = extract_psi(docs).collect()[0]
    assert row["error"] == ""
    assert row["statusCode"] == 200
    assert str(row["date"]) == "2026-02-03 10:30:00"
    lab = row["labdata"]
    assert lab["cls"] == pytest.approx(0.02)
    assert lab["ttfb"] == pytest.approx(122.0)
    assert lab["performanceScore"] == pytest.approx(0.93)
    assert lab["serverResponseTime"] == pytest.approx(1.0)
    assert lab["renderBlockingResources"] == pytest.approx(0.0)
    ole = row["originLoadingExperience"]
    assert ole["cls"] == 200 and ole["fid"] == 203
    assert ole["lcpGood"] == pytest.approx(0.5)
    # intended semantics: loadingExperience carries ITS OWN percentiles
    le = row["loadingExperience"]
    assert le["cls"] == 300 and le["fcp"] == 302


def test_origin_fallback_suppresses_loading_experience(spark):
    docs = _docs(
        spark,
        [
            ("https://a.de/", "c1", "mobile", _body(1, le=True, fallback=True)),
            ("https://b.de/", "c1", "mobile", _body(1, le=False)),
        ],
    )
    rows = {r["url"]: r for r in extract_psi(docs).collect()}
    assert rows["https://a.de/"]["loadingExperience"] is None
    assert rows["https://b.de/"]["loadingExperience"] is None
    assert rows["https://a.de/"]["error"] == ""


def test_malformed_and_incomplete_rows_land_in_error(spark):
    incomplete = json.loads(_body(1))
    del incomplete["lighthouseResult"]["audits"]["total-blocking-time"]
    no_crux = json.loads(_body(1))
    del no_crux["originLoadingExperience"]["metrics"]["FIRST_INPUT_DELAY_MS"]
    docs = _docs(
        spark,
        [
            ("https://ok.de/", "c1", "desktop", _body(1)),
            ("https://broken.de/", "c1", "desktop", "{not json at all"),
            ("https://incomplete.de/", "c1", "desktop", json.dumps(incomplete)),
            ("https://nocrux.de/", "c1", "desktop", json.dumps(no_crux)),
        ],
    )
    errs = {r["url"]: r["error"] for r in extract_psi(docs).collect()}
    assert errs["https://ok.de/"] == ""
    assert errs["https://broken.de/"] != ""
    assert errs["https://incomplete.de/"] == "incomplete labdata"
    assert errs["https://nocrux.de/"] == "incomplete originLoadingExperience"
    facts = psi_facts(docs)
    assert facts.count() == 1
    assert "error" not in facts.columns
