"""xpath module — per-element operations over extracted HTML fragments (A4).

Reference: modules/aggregation/custom/xpath.py:27-28, 221-279. Supported
operations (SUPPORTED_OPERATIONS): null, length, wordcount, regex_count,
regex_match. Semantics replicated exactly:
  - length: character count of the element content;
  - wordcount: strip HTML, whitespace-split, keep tokens with len > 1 whose
    FIRST char is a letter (re.match anchors, :226-231);
  - regex_count: count of re.findall matches, case-INsensitive by default;
  - regex_match: matches joined by '|' (DEFAULT_MATCH_SEPERATOR); tuple
    matches (multi-group patterns) formatted '(g1),(g2)'; NULL when no
    match (:236-256);
  - null: passthrough (no result).

The XPath EXTRACTION itself needs lxml's HTML-tolerant engine (not in this
container) — extraction is stubbed behind ``extract_elements`` which
accepts pre-extracted content or raises; the OPERATIONS (the relational
part) are full Spark expressions, with a pandas UDF only for multi-group
regex_match tuple formatting.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dawis_spark.functions.html import strip_html
from dawis_spark.modules import register

DEFAULT_MATCH_SEPERATOR = "|"  # xpath.py:27 (reference spelling kept)
SUPPORTED_OPERATIONS = ("null", "length", "wordcount", "regex_match", "regex_count")


def extract_elements(df: DataFrame, query: str, body_col: str = "body") -> DataFrame:
    """Live XPath extraction over staged HTML (reference xpath.py:282-302):
    one ``content`` row per matched element, ready for ``evaluate``.

    The engine is the stdlib-based tolerant parser + XPath subset in
    functions/html.html_xpath: '/' and '//' axes, '*', and predicates in
    any step — attribute/position tests plus contains(), starts-with(),
    ends-with(), not(...), text()/'.' comparisons — and trailing '/@attr'
    and '/text()'. lxml's FULL grammar (named axes, unions, arbitrary
    functions) is NOT covered — queries outside the subset return no
    rows; swap in lxml for full parity if it lands in the environment.
    Map-side: parse + match run in one Arrow-batched UDF, the explode is
    the only plan change."""
    from dawis_spark.functions.html import extract_xpath

    return (
        df.withColumn("query", F.lit(query))
        .withColumn("content", F.explode(extract_xpath(query)(F.col(body_col))))
    )


def _spark_pattern(expression: str, case_sensitive: bool) -> str:
    pat = expression if case_sensitive else f"(?i){expression}"
    return pat.replace("\\", "\\\\").replace("'", "\\'")


def op_length(content: Column) -> Column:
    return F.length(content)


def op_wordcount(content: Column) -> Column:
    stripped = strip_html(content)
    toks = F.split(stripped, r"\s+")
    kept = F.filter(
        toks, lambda t: (F.length(t) > 1) & t.rlike("(?i)^[a-z]")
    )
    return F.size(kept)


def op_regex_count(content: Column, expression: str, case_sensitive: bool = False) -> Column:
    pat = _spark_pattern(expression, case_sensitive)
    return F.expr(f"size(regexp_extract_all(__c, '{pat}', 0))")


def _regex_match_udf(expression: str, case_sensitive: bool, separator: str):
    rx = re.compile(expression, 0 if case_sensitive else re.IGNORECASE)

    def fn(contents: pd.Series) -> pd.Series:
        def one(c):
            matches = rx.findall(c or "")
            if not matches:
                return None
            out = []
            for m in matches:
                if isinstance(m, tuple):
                    out.append("(" + "),(".join(m) + ")")
                else:
                    out.append(m)
            return separator.join(out)

        return contents.map(one)

    return F.pandas_udf(fn, T.StringType())


def op_regex_match(
    content: Column,
    expression: str,
    case_sensitive: bool = False,
    separator: str = DEFAULT_MATCH_SEPERATOR,
) -> Column:
    """0/1-group patterns stay JVM-side (array_join of extract_all);
    multi-group patterns need the reference's tuple formatting -> pandas UDF."""
    n_groups = re.compile(expression).groups
    if n_groups <= 1:
        pat = _spark_pattern(expression, case_sensitive)
        joined = F.expr(
            f"array_join(regexp_extract_all(__c, '{pat}', {n_groups}), '{separator}')"
        )
        return F.when(joined == "", F.lit(None)).otherwise(joined)
    return _regex_match_udf(expression, case_sensitive, separator)(content)


@register("xpath")
def evaluate(df: DataFrame, config: dict) -> DataFrame:
    """``df``: (url, cluster, name, query, date, content) pre-extracted rows.
    config: {"operation": one of SUPPORTED_OPERATIONS, "options": {...}}.
    Output matches XPATH_ROW_SCHEMA's element struct: content/operation/result.
    """
    operation = config.get("operation", "null")
    if operation not in SUPPORTED_OPERATIONS:
        raise ValueError(f"unsupported xpath operation: {operation!r}")
    options = config.get("options", {})
    cs = bool(options.get("caseSensitive", False))
    df = df.withColumn("__c", F.col("content"))
    if operation == "null":
        result = F.lit(None).cast("string")
    elif operation == "length":
        result = op_length(F.col("__c")).cast("string")
    elif operation == "wordcount":
        result = op_wordcount(F.col("__c")).cast("string")
    elif operation == "regex_count":
        result = op_regex_count(F.col("__c"), options["expression"], cs).cast("string")
    else:
        result = op_regex_match(
            F.col("__c"),
            options["expression"],
            cs,
            options.get("matchSeperator", DEFAULT_MATCH_SEPERATOR),
        )
    return df.select(
        "url",
        "cluster",
        "name",
        "query",
        "date",
        F.struct(
            F.col("content"),
            F.lit(operation).alias("operation"),
            result.alias("result"),
        ).alias("element"),
    )
