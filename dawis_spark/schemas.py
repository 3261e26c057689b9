"""StructType registry for every table in the reference's data model
(SURVEY.md §1, FIXTURES.md), plus the name-convention schema inferencers.

The reference declares BigQuery SchemaField tuples per sink and infers GSC/GA
column types from column-name conventions; here every relation has one
explicit StructType, and the inferencers produce StructTypes the same way.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# --- URL record (utilities/url.py:4-17) -----------------------------------
URL_STRUCT = T.StructType(
    [
        T.StructField("protocol", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("query", T.StringType(), True),
    ]
)

# --- checks table (database/bigquery.py:183-199, de-normalized per
#     SURVEY §7.5(7): urlset becomes a column, url a struct) ---------------
CHECKS_SCHEMA = T.StructType(
    [
        T.StructField("created", T.TimestampType(), False),
        T.StructField("urlset", T.StringType(), False),
        T.StructField("check", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("diff", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("url", URL_STRUCT, False),
    ]
)

# --- staged HTML fetch documents (html_parser.py:105-117) ------------------
REDIRECT_STRUCT = T.StructType(
    [
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ttfb", T.DoubleType(), True),
    ]
)

HTML_DOC_SCHEMA = T.StructType(
    [
        T.StructField("urlset", T.StringType(), False),
        T.StructField("url", URL_STRUCT, False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("num_redirects", T.IntegerType(), False),
        T.StructField("redirects", T.ArrayType(REDIRECT_STRUCT), True),
        T.StructField("ttfb", T.DoubleType(), False),
        T.StructField("body", T.StringType(), False),
        T.StructField("rendered", T.BooleanType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("configuration_hash", T.StringType(), False),
    ]
)

# --- staged robots.txt documents (robotstxt.py:55-62) ----------------------
ROBOTSTXT_DOC_SCHEMA = T.StructType(
    [
        T.StructField("urlset", T.StringType(), False),
        T.StructField("url", URL_STRUCT, False),
        T.StructField("status_code", T.IntegerType(), True),  # NULL on fetch error
        T.StructField("body", T.StringType(), False),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("date", T.TimestampType(), False),
    ]
)

# --- xpath results with REPEATED RECORD (xpath.py:329-340) -----------------
XPATH_ELEMENT_STRUCT = T.StructType(
    [
        T.StructField("content", T.StringType(), True),
        T.StructField("operation", T.StringType(), True),
        T.StructField("result", T.StringType(), True),
    ]
)

XPATH_ROW_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("cluster", T.StringType(), True),
        T.StructField("name", T.StringType(), False),
        T.StructField("query", T.StringType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("elements", T.ArrayType(XPATH_ELEMENT_STRUCT), False),
    ]
)

# --- alert queue (service/alerting/queue.py:6-27) --------------------------
ALERT_SCHEMA = T.StructType(
    [
        T.StructField("date", T.TimestampType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
        T.StructField("data", T.StringType(), True),  # JSON-serialized context
    ]
)

# --- PageSpeed nested records (google_pagespeed.py:285-317) ----------------
_LABDATA_FIELDS = [
    "cls", "lcp", "fcp", "tbt", "mpfid", "ttfb", "performanceScore",
    "serverResponseTime", "usesTextCompression", "usesLongCacheTtl",
    "domSize", "offscreenImages", "usesOptimizedImages",
    "usesResponsiveImages", "renderBlockingResources", "bootupTime",
    "mainthreadWorkBreakdown",
]
LABDATA_STRUCT = T.StructType(
    [T.StructField(f, T.DoubleType(), True) for f in _LABDATA_FIELDS]
)

_LOADING_EXPERIENCE_FIELDS: list[T.StructField] = []
for _metric in ("cls", "lcp", "fcp", "fid"):
    _LOADING_EXPERIENCE_FIELDS.append(T.StructField(_metric, T.LongType(), True))
    for _band in ("Good", "Medium", "Bad"):
        _LOADING_EXPERIENCE_FIELDS.append(
            T.StructField(f"{_metric}{_band}", T.DoubleType(), True)
        )
LOADING_EXPERIENCE_STRUCT = T.StructType(_LOADING_EXPERIENCE_FIELDS)

PSI_DOC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("strategy", T.StringType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("statusCode", T.IntegerType(), False),
        T.StructField("cluster", T.StringType(), False),
        T.StructField("labdata", LABDATA_STRUCT, False),
        T.StructField("originLoadingExperience", LOADING_EXPERIENCE_STRUCT, False),
        T.StructField("loadingExperience", LOADING_EXPERIENCE_STRUCT, True),
    ]
)


# --- name-convention schema inference --------------------------------------

def infer_gsc_schema(columns: list[str]) -> T.StructType:
    """GSC column typing by prefix (google_search_console.py:497-514):
    impressions*/clicks*/ctr*/position* -> DOUBLE, date -> DATE,
    else STRING; nullable iff the name contains 'Previous'."""
    fields = []
    for name in columns:
        if re.match(r"^(impressions|clicks|ctr|position)", name):
            dtype: T.DataType = T.DoubleType()
        elif name == "date":
            dtype = T.DateType()
        else:
            dtype = T.StringType()
        fields.append(T.StructField(name, dtype, "Previous" in name))
    return T.StructType(fields)


# GA metric name inventories (google_analytics.py:32-276, abridged to the
# membership RULE: ints vs floats; extend the sets as metrics are used).
GA_INT_METRICS = {
    "sessions", "bounces", "transactions", "pageviews", "users", "newUsers",
    "hits", "goalCompletionsAll", "uniquePageviews", "timeOnPage",
}
GA_FLOAT_METRICS = {
    "percentNewSessions", "transactionRevenue", "sessionDuration",
    "avgSessionDuration", "bounceRate", "pagevaluePerSession",
    "goalConversionRateAll", "avgTimeOnPage", "revenuePerTransaction",
}


def infer_ga_schema(dimensions: list[str], metrics: list[str]) -> T.StructType:
    """GA typing by metric-list membership (google_analytics.py:513-540):
    int-list -> LONG, float-list -> DOUBLE, date dim -> DATE, else STRING.
    Unknown metrics fall back to DOUBLE (reference astype default)."""
    fields = [T.StructField("view", T.LongType(), False)]
    for dim in dimensions:
        name = dim.removeprefix("ga:")
        dtype = T.DateType() if name == "date" else T.StringType()
        fields.append(T.StructField(name, dtype, False))
    for metric in metrics:
        name = metric.removeprefix("ga:")
        if name in GA_INT_METRICS:
            dtype = T.LongType()
        else:
            dtype = T.DoubleType()
        fields.append(T.StructField(name, dtype, False))
    return T.StructType(fields)
