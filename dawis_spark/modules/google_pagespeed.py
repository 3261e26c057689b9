"""google_pagespeed (v2, clustered) — PSI response metric extraction.

Reference: modules/aggregation/custom/google_pagespeed.py — the JSON→record
extraction (:345-407) and type validation (:409-487), re-expressed as one
``from_json`` + struct projection (all JVM-side; no per-row Python):

  - labdata: 17 lighthouse audit metrics (:376-392) — numericValue for
    cls/lcp/fcp/tbt/mpfid/ttfb, category score for performanceScore,
    audit scores for the rest.
  - originLoadingExperience / loadingExperience: CrUX percentile +
    Good/Medium/Bad distribution proportions for CLS/LCP/FCP/FID
    (:346-363); loadingExperience only when present and not an
    origin_fallback (:399-404).
  - statusCode from the first network-request item (:365-367).
  - validation (:409-487): required-type checks become null-checks over
    the extracted struct; failing rows land in an ``error`` column (the
    reference raises _InvalidDataException and routes the request to the
    retry queue).

Documented deviation: the reference's loading-experience lambda reads the
fcp/fid *percentile* from ``originLoadingExperience`` even when extracting
``loadingExperience`` (:356,360 — a copy-paste slip; Good/Medium/Bad bands
correctly use ``x``). We implement the intended semantics (each record's
own percentiles) per SURVEY §7.5 "reference bugs to not replicate".

Scale: ``from_json`` with a PRUNED schema — only the ~50 navigated paths
deserialize, the megabyte lighthouse body is never fully parsed; the whole
extraction is a map-side projection, so it composes with any downstream
plan without adding exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dawis_spark.schemas import LABDATA_STRUCT, LOADING_EXPERIENCE_STRUCT

# --- pruned raw-response schema (only navigated paths) ---------------------

_AUDIT_NUM = T.StructType([T.StructField("numericValue", T.DoubleType(), True)])
_AUDIT_SCORE = T.StructType([T.StructField("score", T.DoubleType(), True)])
_NETWORK = T.StructType(
    [
        T.StructField(
            "details",
            T.StructType(
                [
                    T.StructField(
                        "items",
                        T.ArrayType(
                            T.StructType(
                                [T.StructField("statusCode", T.IntegerType(), True)]
                            )
                        ),
                        True,
                    )
                ]
            ),
            True,
        )
    ]
)

_NUMERIC_AUDITS = {
    "cls": "cumulative-layout-shift",
    "lcp": "largest-contentful-paint",
    "fcp": "first-contentful-paint",
    "tbt": "total-blocking-time",
    "mpfid": "max-potential-fid",
    "ttfb": "server-response-time",
}
_SCORE_AUDITS = {
    "serverResponseTime": "server-response-time",
    "usesTextCompression": "uses-text-compression",
    "usesLongCacheTtl": "uses-long-cache-ttl",
    "domSize": "dom-size",
    "offscreenImages": "offscreen-images",
    "usesOptimizedImages": "uses-optimized-images",
    "usesResponsiveImages": "uses-responsive-images",
    "renderBlockingResources": "render-blocking-resources",
    "bootupTime": "bootup-time",
    "mainthreadWorkBreakdown": "mainthread-work-breakdown",
}

# server-response-time carries BOTH numericValue (ttfb) and score
_AUDIT_BOTH = T.StructType(
    [
        T.StructField("numericValue", T.DoubleType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)
_AUDIT_FIELDS = (
    [
        T.StructField(a, _AUDIT_NUM, True)
        for a in _NUMERIC_AUDITS.values()
        if a != "server-response-time"
    ]
    + [
        T.StructField(a, _AUDIT_SCORE, True)
        for a in _SCORE_AUDITS.values()
        if a != "server-response-time"
    ]
    + [
        T.StructField("server-response-time", _AUDIT_BOTH, True),
        T.StructField("network-requests", _NETWORK, True),
    ]
)

_CRUX_METRIC = T.StructType(
    [
        T.StructField("percentile", T.LongType(), True),
        T.StructField(
            "distributions",
            T.ArrayType(
                T.StructType([T.StructField("proportion", T.DoubleType(), True)])
            ),
            True,
        ),
    ]
)
_CRUX_METRICS = T.StructType(
    [
        T.StructField("CUMULATIVE_LAYOUT_SHIFT_SCORE", _CRUX_METRIC, True),
        T.StructField("LARGEST_CONTENTFUL_PAINT_MS", _CRUX_METRIC, True),
        T.StructField("FIRST_CONTENTFUL_PAINT_MS", _CRUX_METRIC, True),
        T.StructField("FIRST_INPUT_DELAY_MS", _CRUX_METRIC, True),
    ]
)
_LOADING_EXPERIENCE_RAW = T.StructType(
    [
        T.StructField("metrics", _CRUX_METRICS, True),
        T.StructField("origin_fallback", T.BooleanType(), True),
    ]
)

RAW_PSI_SCHEMA = T.StructType(
    [
        T.StructField("analysisUTCTimestamp", T.StringType(), True),
        T.StructField(
            "lighthouseResult",
            T.StructType(
                [
                    T.StructField("audits", T.StructType(_AUDIT_FIELDS), True),
                    T.StructField(
                        "categories",
                        T.StructType(
                            [
                                T.StructField(
                                    "performance",
                                    T.StructType(
                                        [T.StructField("score", T.DoubleType(), True)]
                                    ),
                                    True,
                                )
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
        T.StructField("originLoadingExperience", _LOADING_EXPERIENCE_RAW, True),
        T.StructField("loadingExperience", _LOADING_EXPERIENCE_RAW, True),
    ]
)

_CRUX_KEYS = {
    "cls": "CUMULATIVE_LAYOUT_SHIFT_SCORE",
    "lcp": "LARGEST_CONTENTFUL_PAINT_MS",
    "fcp": "FIRST_CONTENTFUL_PAINT_MS",
    "fid": "FIRST_INPUT_DELAY_MS",
}


def _labdata(r: F.Column) -> F.Column:
    audits = r["lighthouseResult"]["audits"]
    named: dict[str, F.Column] = {
        out: audits[audit]["numericValue"] for out, audit in _NUMERIC_AUDITS.items()
    }
    named["performanceScore"] = r["lighthouseResult"]["categories"]["performance"][
        "score"
    ]
    for out, audit in _SCORE_AUDITS.items():
        named[out] = audits[audit]["score"]
    return F.struct(
        *[named[f.name].alias(f.name) for f in LABDATA_STRUCT.fields]
    )


def _loading_experience(rec: F.Column) -> F.Column:
    named: dict[str, F.Column] = {}
    for metric, key in _CRUX_KEYS.items():
        m = rec["metrics"][key]
        named[metric] = m["percentile"]
        for i, band in enumerate(("Good", "Medium", "Bad")):
            named[f"{metric}{band}"] = m["distributions"][i]["proportion"]
    return F.struct(
        *[named[f.name].alias(f.name) for f in LOADING_EXPERIENCE_STRUCT.fields]
    )


def _le_valid(le: F.Column) -> F.Column:
    """Reference _validate_response_data_loading_experience (:458-487):
    every percentile + proportion present and numeric -> non-null here."""
    checks = [le[f.name].isNotNull() for f in LOADING_EXPERIENCE_STRUCT.fields]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def extract_psi(docs: DataFrame, body_col: str = "body") -> DataFrame:
    """(url, cluster, strategy, body) -> PSI fact row + ``error`` column.

    Output columns: url, strategy, date, statusCode, cluster, labdata,
    originLoadingExperience, loadingExperience (NULL when absent or
    origin_fallback), error ('' for valid rows — the reference's
    _InvalidDataException cases carry a reason string instead).
    """
    # Parse ONCE and fan the fields out from the parsed attribute. A naive
    # per-consumer from_json would re-parse the body per output field:
    # Catalyst's JSON-expression optimization rewrites every
    # GetStructField(JsonToStructs(...)) into its own schema-pruned
    # from_json (observed: 160 JsonToStructs in the optimized plan,
    # ~30 ms/row — each copy still scans the full body text). Routing the
    # parse through explode(array(...)) puts it in a Generate node whose
    # output is a plain attribute, which neither CollapseProject nor the
    # JSON rule can inline — exactly one parse per row.
    parsed = docs.withColumn(
        "__p", F.explode(F.array(F.from_json(F.col(body_col), RAW_PSI_SCHEMA)))
    )
    r = F.col("__p")
    raw_le = r["loadingExperience"]
    le = F.when(
        raw_le.isNotNull()
        & (raw_le["origin_fallback"].isNull() | ~raw_le["origin_fallback"]),
        _loading_experience(raw_le),
    )
    out = parsed.select(
        F.col("url"),
        F.col("strategy"),
        F.to_timestamp(
            F.replace(
                F.replace(r["analysisUTCTimestamp"], F.lit("T"), F.lit(" ")),
                F.lit("Z"),
                F.lit(""),
            )
        ).alias("date"),
        r["lighthouseResult"]["audits"]["network-requests"]["details"]["items"][0][
            "statusCode"
        ].alias("statusCode"),
        F.col("cluster"),
        _labdata(r).alias("labdata"),
        F.when(
            r["originLoadingExperience"].isNotNull(),
            _loading_experience(r["originLoadingExperience"]),
        ).alias("originLoadingExperience"),
        le.alias("loadingExperience"),
        r["loadingExperience"].isNotNull().alias("__le_present"),
    )
    # validation (:409-456): required fields non-null; renderBlockingResources
    # is the one nullable labdata field (absent from the reference's
    # validation list and NULLABLE in its BigQuery schema).
    lab_required = [
        f.name for f in LABDATA_STRUCT.fields if f.name != "renderBlockingResources"
    ]
    lab_ok = F.lit(True)
    for name in lab_required:
        lab_ok = lab_ok & F.col("labdata")[name].isNotNull()
    ole_ok = F.col("originLoadingExperience").isNotNull() & _le_valid(
        F.col("originLoadingExperience")
    )
    le_col = F.col("loadingExperience")
    le_ok = le_col.isNull() | _le_valid(le_col)
    error = (
        F.when(F.col("date").isNull(), F.lit("invalid date"))
        .when(F.col("statusCode").isNull(), F.lit("missing statusCode"))
        .when(~lab_ok, F.lit("incomplete labdata"))
        .when(~ole_ok, F.lit("incomplete originLoadingExperience"))
        .when(~le_ok, F.lit("incomplete loadingExperience"))
        .otherwise(F.lit(""))
    )
    return out.drop("__le_present").withColumn("error", error)


def psi_facts(docs: DataFrame, body_col: str = "body") -> DataFrame:
    """Valid PSI fact rows only (the reference's successful-response set)."""
    return extract_psi(docs, body_col).filter(F.col("error") == "").drop("error")
