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
