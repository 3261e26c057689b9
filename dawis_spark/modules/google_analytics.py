"""google_analytics (S6) — report request builder + filter clause translation.

Reference: modules/aggregation/custom/google_analytics.py:384-479. The
reference passes ``dimensionFilterClauses`` / ``metricFilterClauses`` /
``segments`` verbatim into the Reporting v4 batchGet body (:429-437) and
lets GA filter server-side. Here the same clause grammar translates to a
Spark predicate applied post-ingest (``df.filter``), so fixture-staged GA
rows behave exactly like API-filtered ones — and the same translation
doubles as a pushdown predicate on the staged parquet.

Clause grammar (public GA Reporting API v4):
  dimension filter: {dimensionName, not?, operator, expressions[],
                     caseSensitive?} with operator in REGEXP|BEGINS_WITH|
                     ENDS_WITH|PARTIAL|EXACT|IN_LIST|NUMERIC_EQUAL|
                     NUMERIC_GREATER_THAN|NUMERIC_LESS_THAN
  metric filter:    {metricName, not?, operator, comparisonValue} with
                    operator in EQUAL|LESS_THAN|GREATER_THAN|IS_MISSING
  clause:           {operator: OR|AND (default OR), filters: [...]}
  clause list:      clauses AND together (API semantics).

Column names strip the ``ga:`` prefix — the staged schema does the same
(schemas.infer_ga_schema, reference :483-491).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GA_PREFIX = "ga:"


def _col_name(name: str) -> str:
    return name[len(_GA_PREFIX):] if name.lower().startswith(_GA_PREFIX) else name


def _ci(col: Column, case_sensitive: bool) -> Column:
    return col if case_sensitive else F.lower(col)


def _ci_lit(value: str, case_sensitive: bool) -> Column:
    return F.lit(value if case_sensitive else value.lower())


def dimension_filter(filter_spec: dict) -> Column:
    """One dimension filter -> boolean Column. caseSensitive defaults to
    False (GA default); ``not`` negates the whole filter."""
    col = F.col(_col_name(filter_spec["dimensionName"])).cast("string")
    op = filter_spec.get("operator", "REGEXP")
    cs = bool(filter_spec.get("caseSensitive", False))
    exprs = [str(e) for e in filter_spec.get("expressions", [])]
    first = exprs[0] if exprs else ""
    if op == "REGEXP":
        pattern = first if cs else f"(?i){first}"
        pred = col.rlike(pattern)
    elif op == "BEGINS_WITH":
        pred = _ci(col, cs).startswith(_ci_lit(first, cs))
    elif op == "ENDS_WITH":
        pred = _ci(col, cs).endswith(_ci_lit(first, cs))
    elif op == "PARTIAL":
        pred = _ci(col, cs).contains(_ci_lit(first, cs))
    elif op == "EXACT":
        pred = _ci(col, cs) == _ci_lit(first, cs)
    elif op == "IN_LIST":
        pred = _ci(col, cs).isin([e if cs else e.lower() for e in exprs])
    elif op == "NUMERIC_EQUAL":
        pred = col.cast("double") == F.lit(float(first))
    elif op == "NUMERIC_GREATER_THAN":
        pred = col.cast("double") > F.lit(float(first))
    elif op == "NUMERIC_LESS_THAN":
        pred = col.cast("double") < F.lit(float(first))
    else:
        raise ValueError(f"unsupported dimension filter operator: {op}")
    pred = F.coalesce(pred, F.lit(False))
    return ~pred if filter_spec.get("not", False) else pred


def metric_filter(filter_spec: dict) -> Column:
    """One metric filter -> boolean Column (operators per API:
    EQUAL/LESS_THAN/GREATER_THAN/IS_MISSING; comparisonValue is a string)."""
    col = F.col(_col_name(filter_spec["metricName"])).cast("double")
    op = filter_spec.get("operator", "EQUAL")
    if op == "IS_MISSING":
        pred = col.isNull()
    else:
        value = F.lit(float(filter_spec["comparisonValue"]))
        if op == "EQUAL":
            pred = col == value
        elif op == "LESS_THAN":
            pred = col < value
        elif op == "GREATER_THAN":
            pred = col > value
        else:
            raise ValueError(f"unsupported metric filter operator: {op}")
        pred = F.coalesce(pred, F.lit(False))
    return ~pred if filter_spec.get("not", False) else pred


def _clause_predicate(clause: dict, translate) -> Column:
    combine_or = clause.get("operator", "OR").upper() != "AND"
    preds = [translate(f) for f in clause.get("filters", [])]
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = (out | p) if combine_or else (out & p)
    return out


def filter_clauses_predicate(
    dimension_clauses: dict | list | None = None,
    metric_clauses: dict | list | None = None,
) -> Column:
    """Full translation: clauses AND together; filters within a clause
    combine with the clause operator (OR default). Accepts a single
    clause dict or a list of clauses (the API field is a list; the
    reference config uses a dict — both pass through verbatim there)."""
    clauses: list[Column] = []
    for spec, translate in (
        (dimension_clauses, dimension_filter),
        (metric_clauses, metric_filter),
    ):
        if not spec:
            continue
        spec_list = spec if isinstance(spec, list) else [spec]
        for clause in spec_list:
            clauses.append(_clause_predicate(clause, translate))
    if not clauses:
        return F.lit(True)
    out = clauses[0]
    for c in clauses[1:]:
        out = out & c
    return out


def apply_filter_clauses(
    df: DataFrame,
    dimension_clauses: dict | list | None = None,
    metric_clauses: dict | list | None = None,
) -> DataFrame:
    """Post-ingest equivalent of the API-side filtering. The predicate is
    a plain boolean expression, so Catalyst pushes the dimension parts
    down to the parquet scan of a staged GA table."""
    return df.filter(filter_clauses_predicate(dimension_clauses, metric_clauses))


def build_report_request(
    view: int,
    dimensions: list[str],
    metrics: list[str],
    request_date: date,
    segment_id: str | None = None,
    dimension_filter_clauses: dict | list | None = None,
    metric_filter_clauses: dict | list | None = None,
    page_token: str | None = None,
    page_size: int = 100_000,
) -> dict:
    """The batchGet body the reference assembles (:409-437) — kept for
    connector-harness parity (live ingestion) and tested against the
    reference's field layout."""
    report: dict = {
        "viewId": str(view),
        "samplingLevel": "LARGE",
        "dimensions": [{"name": d} for d in dimensions],
        "metrics": [{"expression": m} for m in metrics],
        "dateRanges": [
            {
                "startDate": request_date.strftime("%Y-%m-%d"),
                "endDate": request_date.strftime("%Y-%m-%d"),
            }
        ],
        "pageSize": page_size,
    }
    if page_token is not None:
        report["pageToken"] = str(page_token)
    if segment_id:
        report["segments"] = [{"segmentId": segment_id}]
    if dimension_filter_clauses:
        report["dimensionFilterClauses"] = dimension_filter_clauses
    if metric_filter_clauses:
        report["metricFilterClauses"] = metric_filter_clauses
    return {"reportRequests": [report]}
