"""pagespeed operation — JSON-path metric extraction + threshold checks.

Reference: modules/operation/custom/pagespeed.py (v1): json.loads the raw
PSI body, navigate ``lighthouseResult.audits.<name>.score`` and
``lighthouseResult.categories.performance.score`` (:35-36, 148-175), then
compare against configured thresholds.

Spark-first: ``get_json_object`` does the path navigation JVM-side (no
Python json.loads per row); thresholds reuse the comparison DSL (P9) so the
config grammar matches alerting_check's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.modules import register
from dawis_spark.modules._common import emit_checks, union_checks
from dawis_spark.operators.checks import translate_comparison

PERFORMANCE_SCORE_PATH = "$.lighthouseResult.categories.performance.score"


def audit_score_path(audit: str) -> str:
    return f"$.lighthouseResult.audits.{audit}.score"


@register("pagespeed")
def evaluate(docs: DataFrame, config: dict) -> DataFrame:
    """``docs``: (urlset, url struct, strategy, body JSON string).
    config e.g. {"performance_score": "{v} >= 0.5",
                 "audits": {"uses-text-compression": "{v} == 1"}}."""
    parts: list[DataFrame] = []
    if "performance_score" in config:
        scored = docs.withColumn(
            "v",
            F.get_json_object(F.col("body"), PERFORMANCE_SCORE_PATH).cast("double"),
        )
        parts.append(
            emit_checks(
                scored,
                "pagespeed-performance_score",
                valid=F.coalesce(
                    translate_comparison(config["performance_score"]), F.lit(False)
                ),
                value=F.col("v"),
                error=F.when(F.col("v").isNull(), F.lit("score missing")).otherwise(
                    F.lit("")
                ),
            )
        )
    for audit, template in config.get("audits", {}).items():
        scored = docs.withColumn(
            "v", F.get_json_object(F.col("body"), audit_score_path(audit)).cast("double")
        )
        parts.append(
            emit_checks(
                scored,
                f"pagespeed-{audit}",
                valid=F.coalesce(translate_comparison(template), F.lit(False)),
                value=F.col("v"),
                error=F.when(F.col("v").isNull(), F.lit("score missing")).otherwise(
                    F.lit("")
                ),
            )
        )
    if not parts:
        raise ValueError("pagespeed: no checks configured")
    return union_checks(parts)
