"""URL struct helpers on Spark built-ins.

Reference semantics (utilities/url.py:4-17): a URL is
{protocol, domain, path, query}; parses from string and round-trips back.
robots.txt rewrite (robotstxt.py:22-28): force path to '/robots.txt'.

All pure Column expressions — parse_url/concat are JVM built-ins, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dawis_spark.schemas import URL_STRUCT  # noqa: F401  (re-export for callers)


def parse_url_struct(url: Column) -> Column:
    """string -> struct<protocol,domain,path,query> via parse_url()."""
    return F.struct(
        F.lower(F.regexp_extract(url, r"^(\w+)://", 1)).alias("protocol"),
        F.parse_url(url, F.lit("HOST")).alias("domain"),
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")).alias("path"),
        F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")).alias("query"),
    )


def assemble_url(url_struct: Column) -> Column:
    """struct -> string, the reference's __str__ round trip."""
    q = url_struct.getField("query")
    return F.concat(
        url_struct.getField("protocol"),
        F.lit("://"),
        url_struct.getField("domain"),
        F.coalesce(url_struct.getField("path"), F.lit("")),
        F.when((q.isNotNull()) & (q != ""), F.concat(F.lit("?"), q)).otherwise(
            F.lit("")
        ),
    )


def robotstxt_url(url_struct: Column) -> Column:
    """Rewrite any URL to its site's robots.txt
    (reference: rstrip path '/' then append '/robots.txt')."""
    return F.concat(
        url_struct.getField("protocol"),
        F.lit("://"),
        url_struct.getField("domain"),
        F.lit("/robots.txt"),
    )


def canonical_url_sql(col: str, dialect: str) -> str:
    """Dual-rendered (Spark SQL / DuckDB) canonical-URL expression — the
    SEO canonicalization the reference's URL model implies
    (utilities/url.py:4-17 round-trips {protocol, domain, path, query};
    canonical-tag checking is A4's canonical family):

      - scheme folded to https (http/https variants of a page are one
        canonical resource),
      - host lowercased, leading 'www.' stripped,
      - fragment dropped,
      - tracking params (utm_*) dropped, remaining params sorted,
      - single trailing slash stripped from the path.

    Pure string/array built-ins in both dialects (no UDF, no lambda-free
    regex gaps); patterns avoid backslash escapes ('[?]' not '\\?') so
    the same pattern text parses identically under Spark's escaped
    string literals and DuckDB's standard SQL literals.
    """
    if dialect == "spark":
        split_fn, filter_fn, sort_fn, join_fn, sw = (
            "split",
            "filter",
            "array_sort",
            "array_join",
            "startswith",
        )
    else:
        split_fn, filter_fn, sort_fn, join_fn, sw = (
            "string_split",
            "list_filter",
            "list_sort",
            "array_to_string",
            "starts_with",
        )
    defrag = f"regexp_replace({col}, '[#].*$', '')"
    base = f"regexp_replace({defrag}, '[?].*$', '')"
    # DuckDB regexp_extract yields NULL on no match where Spark yields '';
    # coalesce pins both to '' so the empty-query CASE arm fires identically
    qstr = f"coalesce(regexp_extract({defrag}, '[?](.*)$', 1), '')"
    hostpath = f"regexp_replace({base}, '^[a-zA-Z]+://', '')"
    host = (
        f"regexp_replace(lower(regexp_extract({hostpath}, '^([^/]*)', 1)),"
        f" '^www[.]', '')"
    )
    path = (
        f"regexp_replace(coalesce(regexp_extract({hostpath},"
        f" '^[^/]*(/.*)$', 1), ''), '/$', '')"
    )
    # coalesce: DuckDB's array_to_string over an empty list is NULL,
    # Spark's array_join is ''
    params = (
        f"coalesce({join_fn}({sort_fn}({filter_fn}({split_fn}({qstr}, '&'),"
        f" p -> NOT {sw}(p, 'utm_') AND p != '')), '&'), '')"
    )
    return (
        f"concat('https://', {host}, {path},"
        f" CASE WHEN {params} = '' THEN '' ELSE concat('?', {params}) END)"
    )
