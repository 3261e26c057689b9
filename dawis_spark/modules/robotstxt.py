"""robotstxt operation — status + sitemap checks over staged robots.txt.

Reference: modules/operation/custom/robotstxt.py (op):
  check_status_code (:78-104)   — fetched status == assert
  check_has_sitemap_xml (:106-174) — robots body declares >= 1 Sitemap and
    each declared sitemap URL answers 200. The live 200-probe is a network
    side effect -> it belongs to the connector harness (sources/connectors);
    the relational part here joins the declared sitemaps against a
    ``probed(url, status_code)`` relation the harness produced.

J2 (urlset <-> doc match) happens upstream: docs already carry urlset+url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions.html import robots_sitemaps
from dawis_spark.modules import register
from dawis_spark.modules._common import emit_checks, union_checks


@register("robotstxt")
def evaluate(
    docs: DataFrame, config: dict, probed: DataFrame | None = None
) -> DataFrame:
    """config: {"status_code": {"assert": 200}, "has_sitemap_xml": true};
    ``probed``: optional (url string, status_code) relation from the
    connector harness for the sitemap liveness check."""
    parts: list[DataFrame] = []
    if "status_code" in config:
        want = int(config["status_code"]["assert"])
        parts.append(
            emit_checks(
                docs,
                "robotstxt-status_code",
                valid=F.col("status_code").isNotNull()
                & (F.col("status_code") == F.lit(want)),
                value=F.coalesce(F.col("status_code").cast("string"), F.lit("")),
                error=F.when(
                    F.col("status_code").isNull(), F.lit("fetch error")
                ).otherwise(F.lit("")),
            )
        )
    if config.get("has_sitemap_xml"):
        with_maps = docs.withColumn("__maps", robots_sitemaps(F.col("body")))
        has = F.size("__maps") > 0
        parts.append(
            emit_checks(
                with_maps,
                "robotstxt-has_sitemap_xml",
                valid=has,
                value=F.array_join("__maps", ", "),
                error=F.when(~has, F.lit("no sitemap declared")).otherwise(F.lit("")),
            )
        )
        if probed is not None:
            declared = with_maps.select(
                "urlset", "url", F.explode("__maps").alias("__sitemap")
            )
            joined = declared.join(
                F.broadcast(probed.withColumnsRenamed({"url": "__sitemap"})),
                "__sitemap",
                "left",
            )
            parts.append(
                emit_checks(
                    joined,
                    "robotstxt-sitemap_alive",
                    valid=F.col("status_code") == 200,
                    value=F.col("__sitemap"),
                    error=F.when(
                        F.col("status_code").isNull(), F.lit("sitemap unreachable")
                    )
                    .when(F.col("status_code") != 200, F.lit("sitemap not 200"))
                    .otherwise(F.lit("")),
                )
            )
    if not parts:
        raise ValueError("robotstxt: no checks configured")
    return union_checks(parts)
