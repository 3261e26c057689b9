"""responseheader operation — pure map-side header checks.

Reference: modules/operation/custom/responseheader.py:59-240. Four checks
over staged HTML docs: status_code equality, and content-encoding /
cache-control / expires header equality after lowercasing keys+values (P8).

Known reference bug NOT replicated (SURVEY §7.5(4)): it filters on
``processed_htmlheadings`` instead of its own flag (responseheader.py:35);
here the caller passes the module's own unprocessed slice.

Scale: zero shuffles — every check is a projection of the same scan;
the union is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.modules import register
from dawis_spark.modules._common import emit_checks, lower_headers, union_checks


@register("responseheader")
def evaluate(docs: DataFrame, config: dict) -> DataFrame:
    """config per urlset, e.g. {"status_code": {"assert": 200},
    "content_encoding": {"assert": "gzip"}, "cache_control": {"assert":
    "max-age=3600"}, "expires": {"assert": "..."}}."""
    docs = docs.withColumn("__h", lower_headers(F.col("headers")))
    parts = []
    if "status_code" in config:
        want = config["status_code"]["assert"]
        parts.append(
            emit_checks(
                docs,
                "responseheader-status_code",
                valid=F.col("status_code") == F.lit(want),
            )
        )
    for key, header in (
        ("content_encoding", "content-encoding"),
        ("cache_control", "cache-control"),
        ("expires", "expires"),
    ):
        if key in config:
            want = str(config[key]["assert"]).lower()
            got = F.col("__h").getItem(header)
            parts.append(
                emit_checks(
                    docs,
                    f"responseheader-{key}",
                    valid=got.isNotNull() & (got == F.lit(want)),
                )
            )
    if not parts:
        raise ValueError("responseheader: no checks configured")
    return union_checks(parts)
