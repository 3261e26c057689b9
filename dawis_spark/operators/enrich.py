"""Match enrichment: ordered regex / CSV-pattern labeling with fallback.

Reference semantics (modules/operation/custom/google_search_console.py:
327-386):
  - P1: drop configured input columns, but ``date`` can never be dropped;
  - P3: for each regex expression IN ORDER, rows whose input matches get the
    output label with ``$n`` replaced by the match's capture groups; a ``$n``
    whose group doesn't exist stays literal (the reference swallows
    IndexError at :384-386); later expressions overwrite earlier ones;
  - P4: for each CSV column (label), each cell (pattern): rows whose input
    CONTAINS the pattern (literal or regex, case-(in)sensitive) get the
    label — applied after/between regex expressions in configured order,
    same overwrite rule;
  - P5: rows still holding the empty string get the fallback.

Spark-first: the whole ordered-overwrite pipeline folds into one chained
``when`` expression per match block — a single map-side projection, no
shuffle, fully codegen'd. Pattern sets come from YAML/CSV config and are
config-sized (tens), so a literal fold beats a broadcast theta-join; a join
variant would only win with thousands of patterns.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GROUP_REF = re.compile(r"\$(\d)")


def regex_template_column(
    input_col: Column, pattern: str, output: str, case_sensitive: bool = True
) -> Column:
    """Build the replacement value for one P3 expression: the ``output``
    template with ``$n`` -> ``regexp_extract(input, pattern, n)``.

    A ``$n`` referring past the pattern's group count stays literal text,
    matching the reference's IndexError-pass behavior.
    """
    pat = pattern if case_sensitive else f"(?i){pattern}"
    n_groups = re.compile(pattern).groups
    parts: list[Column] = []
    pos = 0
    for m in _GROUP_REF.finditer(output):
        if m.start() > pos:
            parts.append(F.lit(output[pos : m.start()]))
        group = int(m.group(1))
        if 1 <= group <= n_groups:
            parts.append(F.regexp_extract(input_col, pat, group))
        else:
            parts.append(F.lit(m.group(0)))
        pos = m.end()
    if pos < len(output):
        parts.append(F.lit(output[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def match_enrich(
    df: DataFrame,
    input_field: str,
    output_field: str,
    expressions: list[dict],
    fallback: str = "",
) -> DataFrame:
    """Apply one match block (ordered expressions, later wins) + fallback.

    ``expressions`` entries (YAML-config shape):
      {"regex": pat, "output": "label_$1", "caseSensitive": bool}
      {"csv": {label: [patterns...]}, "useRegex": bool, "caseSensitive": bool}
    """
    out: Column = F.lit("")
    inp = F.col(input_field)
    for expr in expressions:
        cs = bool(expr.get("caseSensitive", True))
        if "regex" in expr:
            pat = expr["regex"] if cs else f"(?i){expr['regex']}"
            value = regex_template_column(inp, expr["regex"], expr["output"], cs)
            out = F.when(inp.rlike(pat), value).otherwise(out)
        elif "csv" in expr:
            use_regex = bool(expr.get("useRegex", False))
            for label, patterns in expr["csv"].items():
                for pattern in patterns:
                    if use_regex:
                        pat = pattern if cs else f"(?i){pattern}"
                        cond = inp.rlike(pat)
                    elif cs:
                        cond = inp.contains(pattern)
                    else:
                        cond = F.lower(inp).contains(pattern.lower())
                    out = F.when(cond, F.lit(label)).otherwise(out)
        else:
            raise ValueError(f"expression needs 'regex' or 'csv': {expr!r}")
    if fallback:
        out = F.when(out == "", F.lit(fallback)).otherwise(out)
    return df.withColumn(output_field, out)


def exclude_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """P1: drop configured columns; ``date`` is protected (reference
    google_search_console.py (op):327-333)."""
    drops = [f for f in fields if f != "date" and f in df.columns]
    return df.drop(*drops) if drops else df
