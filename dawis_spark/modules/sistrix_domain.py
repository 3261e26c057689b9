"""sistrix_domain (S7) — request planning + response parsing to a wide fact.

Reference: modules/aggregation/custom/sistrix_domain.py. The import logic
is config/driver-side (it gates WHETHER and WHAT to request); the response
parsing and fact assembly are Spark-side:

  - method x target matrix with mutual exclusion: exactly one of
    domain / host / paths / urls (:145-152), one request per method per
    target (:162-167, 180-216).
  - weekday gate: ``onlyOnWeekday`` accepts '%a' ('Mon'), '%A' ('Monday')
    or ``isoweekday()`` int; any other day -> the whole configuration is
    skipped (:154-160). Absent -> ``daily=True`` (:93-99).
  - Berlin-day normalization: the request date is "today" in
    Europe/Berlin regardless of the configured warehouse timezone
    (:72-74) — Sistrix publishes its visibility index on Berlin days.
  - method normalization: 'domain.' prefix auto-added, method must be
    one of the allowed endpoints, parameters are allow-listed per method,
    and the ``daily`` flag is injected into visibility-index methods
    (:104-130).
  - per-method response parse (:260-287): visibilityindex -> float,
    pages / kwcount.seo / kwcount.seo.top10 -> int, from
    ``answer[0].<metric>[0].value`` — here a JVM-side get_json_object.
  - schema by method (:333-334, _get_schema_for_field): visibility FLOAT,
    counts INTEGER, date DATE, daily/mobile BOOLEAN, else STRING.

Documented deviation: with addParametersToResult the reference appends a
row PER METHOD containing every field accumulated so far (:196-216 — the
growing ``response_row`` leaks earlier methods' fields into later rows).
We implement the intended semantics: one row per (target, method) carrying
that method's field and parameters. Without the flag: one wide row per
target (all fieldNames), as the reference does.
"""

from __future__ import annotations

from datetime import date, datetime
from zoneinfo import ZoneInfo

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConfigurationInvalidError(ValueError):
    pass


class ConfigurationMissingError(ValueError):
    pass


# service/api/sistrix.py:18-36 endpoint names (public Sistrix API)
ENDPOINT_DOMAIN_VISIBILITYINDEX = "domain.sichtbarkeitsindex"
ENDPOINT_DOMAIN_VISIBILITYINDEX_OVERVIEW = "domain.sichtbarkeitsindex.overview"
ENDPOINT_DOMAIN_PAGES = "domain.pages"
ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO = "domain.kwcount.seo"
ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO_TOP10 = "domain.kwcount.seo.top10"

# sistrix_domain.py:26-37
DAILY_PARAMETER_ALLOWED = (
    ENDPOINT_DOMAIN_VISIBILITYINDEX,
    ENDPOINT_DOMAIN_VISIBILITYINDEX_OVERVIEW,
)
METHODS_PARAMETERS_ALLOWED = {
    ENDPOINT_DOMAIN_VISIBILITYINDEX: ["daily", "mobile", "country"],
    ENDPOINT_DOMAIN_PAGES: [],
    ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO: [],
    ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO_TOP10: [],
}

# response JSON key per method (answer[0].<key>[0].value)
_RESPONSE_KEYS = {
    ENDPOINT_DOMAIN_VISIBILITYINDEX: "sichtbarkeitsindex",
    ENDPOINT_DOMAIN_PAGES: "pages",
    ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO: "kwcount.seo",
    ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO_TOP10: "kwcount.seo.top10",
}


def berlin_request_date(now: datetime) -> date:
    """sistrix_domain.py:72-74: normalize 'now' to the Europe/Berlin day.
    (When the warehouse timezone already IS Berlin the conversion is the
    identity; the reference leaves a datetime in that branch and calls
    ``.date()`` at load time — same day either way.)"""
    if now.tzinfo is None:
        now = now.replace(tzinfo=ZoneInfo("UTC"))
    return now.astimezone(ZoneInfo("Europe/Berlin")).date()


def weekday_passes(on_weekday: str | int | None, today: datetime) -> bool:
    """sistrix_domain.py:154-160: run only when onlyOnWeekday matches
    today's '%a' abbreviation, '%A' name, or isoweekday int."""
    if on_weekday is None:
        return True
    return (
        on_weekday == f"{today:%a}"
        or on_weekday == f"{today:%A}"
        or on_weekday == today.isoweekday()
    )


def validate_targets(configuration: dict) -> list[tuple[str, str]]:
    """Mutual-exclusion matrix (:145-152) -> [(kind, value), ...] with one
    request per domain/host and one per each path/url (:162-175)."""
    domain = configuration.get("domain")
    host = configuration.get("host")
    paths = configuration.get("paths")
    urls = configuration.get("urls")
    present = [x for x in (domain, host, paths, urls) if x is not None]
    if len(present) > 1:
        raise ConfigurationInvalidError(
            "You can't use domain, host, path or url parallel to each other"
        )
    if not present:
        raise ConfigurationInvalidError(
            'You need one of these parameters: "domain, host, path, url"'
        )
    if domain is not None:
        return [("domain", domain)]
    if host is not None:
        return [("host", host)]
    if paths is not None:
        return [("path", p) for p in paths]
    return [("url", u) for u in urls]


def normalize_methods(configuration: dict) -> tuple[list[dict], bool]:
    """Method list validation + daily-flag injection (:93-130).

    Returns (methods, daily): each method dict gains the 'domain.' prefix
    if missing, parameters are allow-listed, and visibility-index methods
    get ``parameters['daily'] = daily`` (daily = no weekday gate set).
    """
    daily = "onlyOnWeekday" not in configuration or not isinstance(
        configuration["onlyOnWeekday"], (str, int)
    )
    methods: list[dict] = []
    for raw in configuration.get("methods", []):
        if "method" not in raw or not isinstance(raw["method"], str):
            raise ConfigurationMissingError("Missing api method")
        name = raw["method"]
        if not name.startswith("domain."):
            name = "domain." + name
        if name not in METHODS_PARAMETERS_ALLOWED:
            raise ConfigurationInvalidError(f'The method "{name}" is not allowed')
        if "fieldName" not in raw or not isinstance(raw["fieldName"], str):
            raise ConfigurationMissingError("Missing a field name in api method")
        parameters = raw.get("parameters", {})
        if not isinstance(parameters, dict):
            raise ConfigurationInvalidError(
                "Method parameters must be type of dictionary"
            )
        for parameter in parameters:
            if parameter not in METHODS_PARAMETERS_ALLOWED[name]:
                raise ConfigurationInvalidError(
                    f'The parameter "{parameter}" for "{name}" is not allowed '
                    "in this module"
                )
        parameters = dict(parameters)
        if name in DAILY_PARAMETER_ALLOWED:
            parameters["daily"] = daily
        methods.append(
            {"method": name, "fieldName": raw["fieldName"], "parameters": parameters}
        )
    if not methods:
        raise ConfigurationMissingError("Missing methods to request")
    return methods, daily


def plan_requests(
    configuration: dict, now: datetime
) -> tuple[list[dict], date] | None:
    """The full driver-side gate: weekday check, target matrix, method
    normalization. Returns (request plan rows, Berlin request date), or
    None when the weekday gate skips this configuration entirely."""
    methods, _daily = normalize_methods(configuration)
    targets = validate_targets(configuration)
    on_weekday = configuration.get("onlyOnWeekday")
    if not isinstance(on_weekday, (str, int)):
        on_weekday = None
    if not weekday_passes(on_weekday, now):
        return None
    plan = [
        {
            "target_kind": kind,
            "target": value,
            "method": m["method"],
            "fieldName": m["fieldName"],
            "parameters": m["parameters"],
        }
        for kind, value in targets
        for m in methods
    ]
    return plan, berlin_request_date(now)


def response_value(body: Column, method: str) -> Column:
    """answer[0].<metric>[0].value, typed per method (:260-287):
    visibility -> double, counts -> bigint. Bracket notation keeps the
    dotted metric names ('kwcount.seo') as single JSON keys."""
    key = _RESPONSE_KEYS[method]
    raw = F.get_json_object(body, f"$.answer[0]['{key}'][0].value")
    if method == ENDPOINT_DOMAIN_VISIBILITYINDEX:
        return raw.cast("double")
    return raw.cast("bigint")


def field_type(field_name: str, methods: list[dict]) -> T.DataType:
    """_get_schema_for_field (:314-336): by originating method, with
    date -> DATE and daily/mobile -> BOOLEAN overrides."""
    if field_name == "date":
        return T.DateType()
    if field_name in ("daily", "mobile"):
        return T.BooleanType()
    method = next(
        (m["method"] for m in methods if m["fieldName"] == field_name), None
    )
    if method == ENDPOINT_DOMAIN_VISIBILITYINDEX:
        return T.DoubleType()
    if method in (
        ENDPOINT_DOMAIN_PAGES,
        ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO,
        ENDPOINT_DOMAIN_KEYWORDCOUNT_SEO_TOP10,
    ):
        return T.LongType()
    return T.StringType()


def domain_fact(
    responses: DataFrame,
    methods: list[dict],
    request_date: date,
    add_parameters_to_result: bool = False,
) -> DataFrame:
    """Assemble the fact from staged responses.

    ``responses``: (target_kind, target, method, fieldName, body) — one row
    per executed request (the connector harness lands these).

    Without addParametersToResult: ONE wide row per target — fieldName
    columns pivoted from the per-method responses (:218-226). With it: one
    row per (target, method) carrying the method's parameters as typed
    columns (:196-216, intended semantics — see module docstring).

    Scale: the pivot is a tiny groupBy per target (method count is
    config-sized); everything else is map-side. The fact appends
    day-partitioned, so existence checks prune to one partition.
    """
    valued = responses.withColumn(
        "__value",
        F.coalesce(
            *[
                F.when(
                    F.col("method") == m["method"],
                    response_value(F.col("body"), m["method"]).cast("string"),
                )
                for m in methods
            ]
        ),
    )
    if add_parameters_to_result:
        out = valued.select(
            "target_kind",
            "target",
            F.lit(request_date).alias("date"),
            F.col("fieldName"),
            F.col("__value"),
            F.col("method"),
        )
        # typed parameter columns (daily/mobile boolean, country string)
        param_cols: dict[str, Column] = {}
        for m in methods:
            for key, value in m["parameters"].items():
                lit = F.when(F.col("method") == m["method"], F.lit(value))
                param_cols[key] = (
                    F.coalesce(param_cols[key], lit) if key in param_cols else lit
                )
        for key, col in param_cols.items():
            out = out.withColumn(key, col.cast(field_type(key, methods)))
        return out.drop("method")
    pivoted = valued.groupBy("target_kind", "target").pivot(
        "fieldName", [m["fieldName"] for m in methods]
    ).agg(F.first("__value"))
    for m in methods:
        pivoted = pivoted.withColumn(
            m["fieldName"],
            F.col(m["fieldName"]).cast(field_type(m["fieldName"], methods)),
        )
    return pivoted.withColumn("date", F.lit(request_date))
