"""Check framework: comparison mini-DSL, check rows, alert emission.

Reference semantics (utilities/parsing.py:4-55): a template like
``"{clicks} >= 10"`` is str.format-ed with row values, split on whitespace,
operands coerced null -> int -> float -> bool, then compared with one of
``== != > < >= <=``; a single boolean token passes through. The special
placeholder ``_empty`` is the empty string.

Spark-first: the template is translated ONCE into a Column expression —
columns stay typed end-to-end (no stringify/re-parse round trip), Catalyst
folds the literal side, and the predicate vectorizes. Row-at-a-time
``parse_comparison`` disappears.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {"==", "!=", ">", "<", ">=", "<="}
_PLACEHOLDER_RE = re.compile(r"^\{([A-Za-z_][A-Za-z0-9_]*)\}$")


def _operand(token: str) -> Column:
    """One side of the comparison -> Column (reference coercion order)."""
    m = _PLACEHOLDER_RE.match(token)
    if m:
        return F.col(m.group(1))
    if token == "_empty":
        return F.lit("")
    if token.lower() in ("null", "none"):
        return F.lit(None)
    try:
        return F.lit(int(token))
    except ValueError:
        pass
    try:
        return F.lit(float(token))
    except ValueError:
        pass
    if token == "true":
        return F.lit(True)
    if token == "false":
        return F.lit(False)
    return F.lit(token)


def translate_comparison(template: str) -> Column:
    """``"{col} >= 10"`` -> boolean Column. Same grammar as the reference:
    whitespace-separated, exactly 1 (bool) or 3 tokens."""
    tokens = template.split()
    if len(tokens) == 1:
        op = _operand(tokens[0])
        return op.cast("boolean")
    if len(tokens) != 3 or tokens[1] not in _OPS:
        raise SyntaxError(f"bad comparison template: {template!r}")
    left, op, right = _operand(tokens[0]), tokens[1], _operand(tokens[2])
    if op == "==":
        return left == right
    if op == "!=":
        return left != right
    if op == ">":
        return left > right
    if op == "<":
        return left < right
    if op == ">=":
        return left >= right
    return left <= right


def check_rows(
    df: DataFrame,
    checks: dict[str, str],
    value_cols: dict[str, str] | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Evaluate named comparison templates into normalized check rows.

    Output schema mirrors the reference checks table (database/bigquery.py:
    183-199): one row per input row per check with ``check`` name,
    stringified ``value`` (service/check.py:45 stringifies everything) and
    boolean ``valid``. ``key_cols`` are carried through for identification.

    Scale: a union of N narrow projections over one cached scan; each branch
    is a map-only plan, no shuffle.
    """
    key_cols = key_cols or []
    parts = []
    for name, template in checks.items():
        valid = translate_comparison(template)
        value_col = (value_cols or {}).get(name)
        value = (
            F.col(value_col).cast("string") if value_col else F.lit(None).cast("string")
        )
        parts.append(
            df.select(
                *[F.col(c) for c in key_cols],
                F.lit(name).alias("check"),
                value.alias("value"),
                valid.alias("valid"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def alerts_per_line(
    df: DataFrame,
    check_template: str,
    groups: list[str],
    message_template: str,
    negate: bool = False,
) -> DataFrame:
    """A6 (alerting_check.py:171-196): evaluate the check per result row and
    emit one alert per failing row per group.

    Reference alert condition: fire iff ``result_check != negate``
    (alerting_check.py:192 — the AND/OR precedence resolves to XOR).
    ``message_template`` uses ``{col}`` placeholders, rendered with
    ``format_string`` so templating stays JVM-side.
    """
    ok = translate_comparison(check_template)
    fmt, args = _template_to_format_string(message_template)
    fired = df.filter(ok != F.lit(negate))
    groups_col = F.array(*[F.lit(g) for g in groups])
    return (
        fired.withColumn("group", F.explode(groups_col))
        .select(
            F.col("group"),
            F.format_string(fmt, *[F.col(a) for a in args]).alias("message"),
        )
    )


def alerts_aggregate(
    df: DataFrame, groups: list[str], message_template: str
) -> DataFrame:
    """A5 (alerting_check.py:197-231): whole result set -> one alert per
    group with ``{resultsCount}`` templating; no alert on an empty set."""
    counted = df.agg(F.count(F.lit(1)).alias("resultsCount"))
    fmt, args = _template_to_format_string(message_template)
    groups_col = F.array(*[F.lit(g) for g in groups])
    return (
        counted.filter(F.col("resultsCount") > 0)
        .withColumn("group", F.explode(groups_col))
        .select(
            F.col("group"),
            F.format_string(fmt, *[F.col(a) for a in args]).alias("message"),
        )
    )


def _template_to_format_string(template: str) -> tuple[str, list[str]]:
    """``"count={resultsCount}"`` -> (``"count=%s"``, ["resultsCount"])."""
    args: list[str] = []

    def repl(m: re.Match) -> str:
        args.append(m.group(1))
        return "%s"

    fmt = re.sub(r"\{([A-Za-z_][A-Za-z0-9_]*)\}", repl, template)
    return fmt.replace("%%", "%"), args


def dq_suite(checks: list[tuple[str, "DataFrame"]]) -> "DataFrame":
    """Warehouse data-quality suite (the dbt-tests shape, SURVEY §2.5's
    comparison checks generalized from per-row to per-RELATION
    invariants): each entry is (check_name, violations_df) where the
    DataFrame's rows are the violations; the suite reduces each to ONE
    summary row (check, n_violations, passed) and unions them — a single
    narrow relation a scheduler can alert on, exactly like the buffered
    check insert (K5) the reference batches per module.

    Each violations_df stays lazy; the counts are independent aggregates
    (Spark runs them as one job per branch of the union — each branch's
    scan prunes to the checked columns). Callers compose the standard
    invariant library from plain DataFrame ops:

      - PK uniqueness:    groupBy(pk).count().filter(n > 1)
      - FK integrity:     child.join(parent, fk, "left_anti")
      - null rate:        df.filter(col.isNull())
      - accepted values:  df.filter(~col.isin(domain))
    """
    from functools import reduce

    from pyspark.sql import functions as FF

    parts = [
        df.agg(FF.count(FF.lit(1)).alias("n_violations")).select(
            FF.lit(name).alias("check_name"),
            "n_violations",
            (FF.col("n_violations") == 0).alias("passed"),
        )
        for name, df in checks
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
