"""metatags operation — title/description/canonical checks over staged HTML.

Reference: modules/operation/custom/metatags.py. Checks (per urlset config):
  has_title / has_description        — non-empty tag exists == assert
                                       (:115-164 / :423-468; error 'title
                                       missing' when absent and not valid)
  is_title_empty / is_description_empty — emptiness == assert (:166-207)
  has_title_changed / has_description_changed — latest snapshot vs previous
                                       (J4/W2, :209-275/:517-583; diff =
                                       previous value)
  has_title_duplicates / has_description_duplicates — same value on >1 URL
                                       within the urlset (A2, :277-377;
                                       diff = other URLs comma-joined)
  multiple tags -> 'metatags-problem-multi-title/-description' (:89-113)
  canonical self-reference           — canonical href == own URL (:740-770)

Spark shape (SURVEY §3.3): ONE pandas-UDF extraction pass, then every check
is a projection/window/groupBy branch of that cached frame, unioned into a
single checks append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dawis_spark.functions.html import (
    extract_canonicals,
    extract_descriptions,
    extract_titles,
)
from dawis_spark.functions.urls import assemble_url
from dawis_spark.modules import register
from dawis_spark.modules._common import emit_checks, union_checks


def _tag_checks(
    df: DataFrame, tag: str, values_col: str, config: dict
) -> list[DataFrame]:
    """Shared title/description check family. ``values_col`` holds the
    extracted tag texts array."""
    cfg = config.get(tag, {})
    parts: list[DataFrame] = []
    vals = F.col(values_col)
    multi = F.size(vals) > 1
    nonempty = F.array_remove(F.transform(vals, lambda t: F.trim(t)), "")
    # last non-empty value wins, like the reference's overwrite loop
    value = F.when(F.size(nonempty) > 0, F.element_at(nonempty, -1)).otherwise(
        F.lit("")
    )
    single = df.filter(~multi)

    if "problem_multi" in cfg:
        parts.append(
            emit_checks(
                df.filter(multi),
                f"metatags-problem-multi-{tag}",
                valid=F.lit(False),
                value=F.size(vals),
                error=F.lit(f"multiple {tag} tags"),
            )
        )
    if f"has_{tag}" in cfg:
        want = bool(cfg[f"has_{tag}"])
        exists = F.size(nonempty) > 0
        parts.append(
            emit_checks(
                single,
                f"metatags-has_{tag}",
                valid=exists == F.lit(want),
                value=value,
                error=F.when(
                    (F.size(vals) == 0) & (exists != F.lit(want)),
                    F.lit(f"{tag} missing"),
                ).otherwise(F.lit("")),
            )
        )
    if f"is_{tag}_empty" in cfg:
        want = bool(cfg[f"is_{tag}_empty"])
        empty = F.size(nonempty) == 0
        parts.append(
            emit_checks(
                single,
                f"metatags-is_{tag}_empty",
                valid=empty == F.lit(want),
                value=value,
            )
        )
    if f"has_{tag}_changed" in cfg:
        want = bool(cfg[f"has_{tag}_changed"])
        w = Window.partitionBy("urlset", assemble_url(F.col("url"))).orderBy(
            F.asc("date")
        )
        with_prev = single.withColumn("__v", value).withColumn(
            "__prev", F.lag("__v").over(w)
        )
        latest = (
            with_prev.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("urlset", assemble_url(F.col("url"))).orderBy(
                        F.desc("date")
                    )
                ),
            )
            .filter((F.col("__rn") == 1) & F.col("__prev").isNotNull())
        )
        changed = F.col("__v") != F.col("__prev")
        parts.append(
            emit_checks(
                latest,
                f"metatags-has_{tag}_changed",
                valid=changed == F.lit(want),
                value=F.col("__v"),
                diff=F.col("__prev"),
            )
        )
    if f"has_{tag}_duplicates" in cfg:
        want = bool(cfg[f"has_{tag}_duplicates"])
        latest = (
            single.withColumn("__v", value)
            .withColumn("__u", assemble_url(F.col("url")))
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("urlset", "__u").orderBy(F.desc("date"))
                ),
            )
            .filter((F.col("__rn") == 1) & (F.col("__v") != ""))
        )
        groups = (
            latest.groupBy("urlset", "__v")
            .agg(F.sort_array(F.collect_list(F.struct("__u", "url"))).alias("__g"))
        )
        exploded = groups.select(
            "urlset",
            "__v",
            F.col("__g"),
            F.explode("__g").alias("__e"),
        ).select(
            "urlset",
            "__v",
            F.col("__e.url").alias("url"),
            F.col("__e.__u").alias("__u"),
            F.array_join(
                F.transform(
                    F.filter("__g", lambda s: s.getField("__u") != F.col("__u")),
                    lambda s: s.getField("__u"),
                ),
                ", ",
            ).alias("__others"),
        )
        dup = F.col("__others") != ""
        parts.append(
            emit_checks(
                exploded,
                f"metatags-has_{tag}_duplicates",
                valid=dup == F.lit(want),
                value=F.col("__v"),
                diff=F.col("__others"),
                error=F.when(dup, F.lit(f"{tag} duplicates in url-set detected"))
                .otherwise(F.lit("")),
            )
        )
    return parts


@register("metatags")
def evaluate(docs: DataFrame, config: dict) -> DataFrame:
    extracted = docs.withColumn("__titles", extract_titles(F.col("body"))).withColumn(
        "__descriptions", extract_descriptions(F.col("body"))
    ).withColumn("__canonicals", extract_canonicals(F.col("body")))

    parts: list[DataFrame] = []
    parts += _tag_checks(extracted, "title", "__titles", config)
    parts += _tag_checks(extracted, "description", "__descriptions", config)

    if "canonical" in config:
        # canonical self-reference (:740-770): exactly one canonical whose
        # href equals the document's own URL string
        own = assemble_url(F.col("url"))
        href = F.when(
            F.size("__canonicals") == 1, F.element_at("__canonicals", 1)
        ).otherwise(F.lit(None))
        parts.append(
            emit_checks(
                extracted,
                "metatags-canonical",
                valid=href.isNotNull() & (href == own),
                value=F.coalesce(href, F.lit("")),
                error=F.when(F.size("__canonicals") == 0, F.lit("canonical missing"))
                .when(F.size("__canonicals") > 1, F.lit("multiple canonicals"))
                .otherwise(F.lit("")),
            )
        )
    if not parts:
        raise ValueError("metatags: no checks configured")
    return union_checks(parts)
