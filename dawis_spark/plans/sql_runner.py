"""Parameterized SQL runner — the reference's BigQuery query path on Spark.

Reference semantics (service/bigquery/query_helper.py:21-85):
  - a query string with named parameters,
  - scalar parameters typed str|int|float,
  - one dynamic parameter form: ``{"dateDaysAgo": N}`` resolved at submit
    time to ``current_date - N days``,
  - results streamed in 25 000-row pages, renamed via column_mapping.

Spark-first mapping: ``spark.sql(query, args=...)`` binds typed named
parameters inside Catalyst (constant-folded, usable for partition pruning);
paging disappears (lazy DataFrame); renames are plan nodes, not row rewrites.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession


def resolve_parameters(
    parameters: Mapping[str, Any] | None,
    today: _dt.date | None = None,
) -> dict[str, Any]:
    """Resolve dynamic parameter forms to scalars.

    ``{"dateDaysAgo": N}`` -> date string ``today - N days``
    (reference: service/bigquery/query_helper.py:73-78; the reference
    formats as ``%Y-%m-%d`` strings — we keep real ``date`` objects so the
    bind is typed and prunes date-partitioned scans).
    """
    if not parameters:
        return {}
    today = today or _dt.date.today()
    resolved: dict[str, Any] = {}
    for name, value in parameters.items():
        if isinstance(value, Mapping):
            if set(value.keys()) == {"dateDaysAgo"}:
                resolved[name] = today - _dt.timedelta(days=int(value["dateDaysAgo"]))
            else:
                raise ValueError(
                    f"unsupported dynamic parameter {name!r}: {dict(value)!r}"
                )
        elif isinstance(value, (str, int, float, bool, _dt.date, _dt.datetime)):
            resolved[name] = value
        else:
            raise ValueError(f"unsupported parameter type for {name!r}: {type(value)}")
    return resolved


def run_query(
    spark: SparkSession,
    query: str,
    parameters: Mapping[str, Any] | None = None,
    column_mapping: Mapping[str, str] | None = None,
    today: _dt.date | None = None,
) -> DataFrame:
    """Run a (possibly parameterized) SQL query and apply column renames.

    The whole pipeline stays one lazy Catalyst plan: bind -> parse ->
    optimize -> rename; nothing is materialized here.
    """
    args = resolve_parameters(parameters, today=today)
    df = spark.sql(query, args=args) if args else spark.sql(query)
    if column_mapping:
        from dawis_spark.plans.column_mapping import apply_column_mapping

        df = apply_column_mapping(df, column_mapping)
    return df
