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


def _canonical_checks(
    extracted: DataFrame, config: dict, probes: DataFrame | None
) -> list[DataFrame]:
    """The full canonical family (reference metatags.py:688-807).

    get_canonical_href (:688-698) iterates every <link rel=canonical> and
    keeps the LAST href ('' when none) — replicated as element_at(-1).

    - has_canonical (:700-738): valid only when a canonical EXISTS and the
      assert is True (the reference's inner-if quirk: asserting False can
      never pass — valid = exists AND assert); error 'no canonical' when
      absent.
    - canonical_is_self_referencing (:740-770): valid = exists AND
      href == own URL AND assert; error always ''.
    - canonical_href_200 (:772-807): the live GET probe routed through the
      connector harness — ``probes`` is a (href, status_code) DataFrame
      produced OUTSIDE the lazy DAG (live connector or FixtureConnector in
      tests; side-effecting HTTP never hides inside a transformation).
      valid = (status == 200) == assert; error when a href probes non-200.
    """
    canonical_cfg = config["canonical"]
    if canonical_cfg is True:  # legacy single-check grammar
        canonical_cfg = {"canonical_is_self_referencing": True}
    own = assemble_url(F.col("url"))
    exists = F.size("__canonicals") > 0
    href = F.when(exists, F.element_at("__canonicals", -1)).otherwise(F.lit(""))
    extracted = extracted.withColumn("__href", href)
    parts: list[DataFrame] = []
    if "has_canonical" in canonical_cfg:
        want = bool(canonical_cfg["has_canonical"])
        parts.append(
            emit_checks(
                extracted,
                "metatags-has_canonical",
                valid=exists & F.lit(want),
                value=F.col("__href"),
                error=F.when(~exists, F.lit("no canonical")).otherwise(F.lit("")),
            )
        )
    if "canonical_is_self_referencing" in canonical_cfg:
        want = bool(canonical_cfg["canonical_is_self_referencing"])
        parts.append(
            emit_checks(
                extracted,
                "metatags-canonical_is_self_referencing",
                valid=exists & (F.col("__href") == own) & F.lit(want),
                value=F.col("__href"),
                error=F.when(~exists, F.lit("canonical missing")).otherwise(
                    F.lit("")
                ),
            )
        )
    if "canonical_href_200" in canonical_cfg:
        if probes is None:
            raise ValueError(
                "canonical_href_200 needs probe results: pass "
                "probes=(href, status_code) from the connector harness"
            )
        want = bool(canonical_cfg["canonical_href_200"])
        probed = extracted.join(
            probes.select(
                F.col("href").alias("__href"),
                F.col("status_code").alias("__status"),
            ),
            "__href",
            "left",
        )
        ok200 = exists & (F.col("__status") == 200)
        parts.append(
            emit_checks(
                probed,
                "metatags-canonical_href_200",
                valid=ok200 == F.lit(want),
                value=F.col("__href"),
                error=F.when(
                    exists & ~F.coalesce(F.col("__status") == 200, F.lit(False)),
                    F.lit("href in canonical not valid"),
                ).otherwise(F.lit("")),
            )
        )
    return parts


@register("metatags")
def evaluate(docs: DataFrame, config: dict, probes: DataFrame | None = None) -> DataFrame:
    extracted = docs.withColumn("__titles", extract_titles(F.col("body"))).withColumn(
        "__descriptions", extract_descriptions(F.col("body"))
    ).withColumn("__canonicals", extract_canonicals(F.col("body")))

    parts: list[DataFrame] = []
    parts += _tag_checks(extracted, "title", "__titles", config)
    parts += _tag_checks(extracted, "description", "__descriptions", config)

    if "canonical" in config:
        parts += _canonical_checks(extracted, config, probes)
    if not parts:
        raise ValueError("metatags: no checks configured")
    return union_checks(parts)
