"""sistrix_optimizer (S8) — method-dependent schemas + response pivots.

Reference: modules/aggregation/custom/sistrix_optimizer.py. The config
validation and request planning are driver-side (they gate WHAT to
request); the response parsing is Spark-side over staged JSON bodies:

  - configuration validation (:48-131): apiKey and projects required,
    'optimizer.' method prefix auto-added, only the visibility and
    ranking endpoints allowed; optional useDatetimeApi /
    useDatetimeRequest flip the request_date/date column types between
    DATE and DATETIME (:77, :83); addParameterToTable grows the
    visibility schema with tag / competitors columns (:93-97).
  - per-method schema selection (:82-112): visibility ->
    (request_date, date, source, type, value FLOAT [, tag]
    [, competitors BOOL]); ranking -> (request_date, keyword,
    position INT NULLABLE, positionOverflow BOOL, url, tags, device,
    country, traffic INT NULLABLE, searchengine).
  - request planning (:136-164): one request per project, Berlin "today"
    as the request date (shared with sistrix_domain), and the ranking
    endpoint injects limit = 1,000,000 when unset (:157-158).
  - visibility response pivot (:180-228): answer[0]['optimizer.
    visibility'][*] with the source column resolved by LAST-match-wins
    precedence url > host > path > domain (the reference's if-chain
    overwrites in that order); tag passes through only when requested;
    competitors comes from the REQUEST parameters (default false), not
    the response.
  - ranking response pivot (:230-273): answer[0]['optimizer.rankings']
    [*]['optimizer.ranking'][*]; position/positionOverflow via the
    shared functions/parsing.parse_position (the ">100" overflow
    semantics, S8's hard part); traffic via parse_int_or_null.

Documented deviation (same discipline as sistrix_domain / parsing.py):
where the reference raises SistrixApiError mid-job for a visibility row
with no source (:206-207), the Spark pipeline emits NULL source/type so
callers filter or alert instead of killing a 1000-executor job.

Scale: both parses are exploded from_json projections — map-side only,
no exchange; the fact append is day-partitioned on request_date like
every other connector fact (catalog.py discipline).
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dawis_spark.functions.parsing import parse_int_or_null, parse_position
from dawis_spark.modules.sistrix_domain import (
    ConfigurationInvalidError,
    ConfigurationMissingError,
    berlin_request_date,
)

# service/api/sistrix.py:56-57 endpoint names (public Sistrix API)
ENDPOINT_OPTIMIZER_RANKING = "optimizer.ranking"
ENDPOINT_OPTIMIZER_VISIBILITY = "optimizer.visibility"

# sistrix_optimizer.py:27
DEFAULT_API_RANKING_LIMIT = 1_000_000


def validate_configuration(configuration: dict) -> dict:
    """sistrix_optimizer.py:48-131 — required keys, method normalization
    and allow-listing, datetime flags, addParameterToTable extras.

    Returns the normalized plan inputs:
    {api_key, projects, method, parameters, use_datetime_api,
     use_datetime_request, add_parameters_to_table}.
    """
    api_key = configuration.get("apiKey")
    if not isinstance(api_key, str):
        raise ConfigurationMissingError("Missing API Key for configuration")
    projects = configuration.get("projects")
    if not isinstance(projects, list):
        raise ConfigurationMissingError("Missing project for configuration")
    method = configuration.get("method")
    if not isinstance(method, str):
        raise ConfigurationMissingError("Missing method for configuration")
    if not method.startswith("optimizer."):
        method = "optimizer." + method
    if method not in (ENDPOINT_OPTIMIZER_VISIBILITY, ENDPOINT_OPTIMIZER_RANKING):
        raise ConfigurationInvalidError(
            f'Invalid method "{configuration["method"]}" in configuration'
        )
    parameters = configuration.get("parameters")
    add_parameters = configuration.get("addParameterToTable")
    return {
        "api_key": api_key,
        "projects": projects,
        "method": method,
        "parameters": parameters if isinstance(parameters, dict) else {},
        "use_datetime_api": configuration.get("useDatetimeApi") is True,
        "use_datetime_request": configuration.get("useDatetimeRequest") is True,
        "add_parameters_to_table": (
            add_parameters if isinstance(add_parameters, list) else []
        ),
    }


def schema_for_method(
    method: str,
    use_datetime_request: bool = False,
    use_datetime_api: bool = False,
    add_parameters_to_table: list | None = None,
) -> T.StructType:
    """Method-dependent schema selection (sistrix_optimizer.py:82-112).
    REQUIRED fields map to nullable=False; the BigQuery DATE/DATETIME
    split maps to DateType/TimestampType.

    Deviation-affected fields stay NULLABLE here even though the
    reference's BigQuery schema marks them REQUIRED: ``source``/``type``
    (visibility_fact emits NULL for sourceless rows, where the reference
    raises) and ``positionOverflow`` (ranking_fact emits NULL for junk
    positions so callers can filter the flagged rows) — declaring them
    REQUIRED would make the declared schema fail on exactly the rows the
    pivot contract tells callers to inspect."""
    add = add_parameters_to_table or []
    req_t = T.TimestampType() if use_datetime_request else T.DateType()
    if method == ENDPOINT_OPTIMIZER_VISIBILITY:
        api_t = T.TimestampType() if use_datetime_api else T.DateType()
        fields = [
            T.StructField("request_date", req_t, False),
            T.StructField("date", api_t, False),
            T.StructField("source", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), False),
        ]
        if "tag" in add:
            fields.append(T.StructField("tag", T.StringType(), True))
        if "competitors" in add:
            fields.append(T.StructField("competitors", T.BooleanType(), False))
        return T.StructType(fields)
    if method == ENDPOINT_OPTIMIZER_RANKING:
        return T.StructType(
            [
                T.StructField("request_date", req_t, False),
                T.StructField("keyword", T.StringType(), False),
                T.StructField("position", T.IntegerType(), True),
                T.StructField("positionOverflow", T.BooleanType(), True),
                T.StructField("url", T.StringType(), True),
                T.StructField("tags", T.StringType(), False),
                T.StructField("device", T.StringType(), False),
                T.StructField("country", T.StringType(), False),
                T.StructField("traffic", T.IntegerType(), True),
                T.StructField("searchengine", T.StringType(), False),
            ]
        )
    raise ConfigurationInvalidError(f'Invalid method "{method}"')


def plan_requests(configuration: dict, now: datetime) -> list[dict]:
    """One request per project (:143-164): Berlin 'today' as the request
    date plus the configured parameters; the ranking endpoint injects
    limit = DEFAULT_API_RANKING_LIMIT when the config didn't set one."""
    plan_inputs = validate_configuration(configuration)
    base = {"date": berlin_request_date(now), **plan_inputs["parameters"]}
    if (
        plan_inputs["method"] == ENDPOINT_OPTIMIZER_RANKING
        and "limit" not in base
    ):
        base["limit"] = DEFAULT_API_RANKING_LIMIT
    return [
        {"method": plan_inputs["method"], "project": project, **base}
        for project in plan_inputs["projects"]
    ]


# from_json item schemas — position/traffic as STRING so the int-vs-
# overflow-marker union survives parsing (parse_position casts)
_VIS_ITEM = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("tag", T.StringType()),
    ]
)
_VIS_SCHEMA = T.StructType(
    [
        T.StructField(
            "answer",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "optimizer.visibility", T.ArrayType(_VIS_ITEM)
                        )
                    ]
                )
            ),
        )
    ]
)
_RANK_ITEM = T.StructType(
    [
        T.StructField("keyword", T.StringType()),
        T.StructField("position", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("tags", T.StringType()),
        T.StructField("device", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("traffic", T.StringType()),
        T.StructField("searchengine", T.StringType()),
    ]
)
_RANK_SCHEMA = T.StructType(
    [
        T.StructField(
            "answer",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "optimizer.rankings",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "optimizer.ranking",
                                            T.ArrayType(_RANK_ITEM),
                                        )
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def _request_date_lit(request_date: datetime | date, use_datetime: bool) -> Column:
    lit = F.lit(request_date)
    return lit.cast("timestamp") if use_datetime else lit.cast("date")


def visibility_fact(
    responses: DataFrame,
    request_date: datetime | date,
    request_parameters: dict | None = None,
    add_parameters_to_table: list | None = None,
    use_datetime_request: bool = False,
    use_datetime_api: bool = False,
    tz: str = "Europe/Berlin",
) -> DataFrame:
    """Visibility response pivot (sistrix_optimizer.py:180-228).

    ``responses``: (project, body) — one staged JSON body per project
    request. Output matches schema_for_method(visibility, ...): source
    resolved LAST-match-wins (url > host > path > domain — the
    reference's if-chain overwrite order), value -> double, tag only
    when requested AND present, competitors from the REQUEST parameters
    (default false). Rows with no source surface as NULL source/type
    (reference raises — see module docstring). The API date converts to
    ``tz`` wall time before any DATE truncation (the reference's
    ``.astimezone(timezone(self.timezone))``, :211 — Sistrix publishes
    Berlin days, so the default keeps a +02:00 midnight on its day)."""
    add = add_parameters_to_table or []
    params = request_parameters or {}
    item = F.explode(
        F.element_at(F.from_json(F.col("body"), _VIS_SCHEMA)["answer"], 1).getItem(
            "optimizer.visibility"
        )
    ).alias("__i")
    rows = responses.select(item)
    src = F.coalesce(
        F.col("__i.url"), F.col("__i.host"), F.col("__i.path"), F.col("__i.domain")
    )
    src_type = (
        F.when(F.col("__i.url").isNotNull(), F.lit("url"))
        .when(F.col("__i.host").isNotNull(), F.lit("host"))
        .when(F.col("__i.path").isNotNull(), F.lit("path"))
        .when(F.col("__i.domain").isNotNull(), F.lit("domain"))
    )
    api_date = F.from_utc_timestamp(F.to_timestamp(F.col("__i.date")), tz)
    cols = [
        _request_date_lit(request_date, use_datetime_request).alias("request_date"),
        (api_date if use_datetime_api else api_date.cast("date")).alias("date"),
        src.alias("source"),
        src_type.alias("type"),
        F.col("__i.value").cast("double").alias("value"),
    ]
    if "tag" in add:
        cols.append(F.col("__i.tag").alias("tag"))
    if "competitors" in add:
        cols.append(
            F.lit(bool(params.get("competitors", False))).alias("competitors")
        )
    return rows.select(*cols)


def ranking_fact(
    responses: DataFrame,
    request_date: datetime | date,
    use_datetime_request: bool = False,
) -> DataFrame:
    """Ranking response pivot (sistrix_optimizer.py:230-273): two-level
    explode of answer[0]['optimizer.rankings'][*]['optimizer.ranking'],
    position parsed with the shared overflow semantics (">100" ->
    position=100, positionOverflow=true; non-numeric junk -> NULL
    position AND NULL overflow — the filter/flag substitute for the
    reference's raise, distinguishable from an API null position which
    keeps overflow=false), traffic int-or-null."""
    outer = F.explode(
        F.element_at(F.from_json(F.col("body"), _RANK_SCHEMA)["answer"], 1).getItem(
            "optimizer.rankings"
        )
    ).alias("__o")
    inner = F.explode(F.col("__o").getItem("optimizer.ranking")).alias("__i")
    rows = responses.select(outer).select(inner)
    pos = parse_position(F.col("__i.position"))
    return rows.select(
        _request_date_lit(request_date, use_datetime_request).alias("request_date"),
        F.col("__i.keyword").alias("keyword"),
        pos.getField("position").alias("position"),
        pos.getField("positionOverflow").alias("positionOverflow"),
        F.col("__i.url").alias("url"),
        F.col("__i.tags").alias("tags"),
        F.col("__i.device").alias("device"),
        F.col("__i.country").alias("country"),
        parse_int_or_null(F.col("__i.traffic")).alias("traffic"),
        F.col("__i.searchengine").alias("searchengine"),
    )
