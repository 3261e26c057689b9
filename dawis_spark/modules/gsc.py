"""Google-Search-Console pipeline — enrichment operation + previous-period
aggregation, composed from the operator layer.

Reference:
  - operation _process_data (google_search_console.py op:327-386):
    excludeInputFields (P1, date protected) then ordered match blocks
    (P3/P4/P5) — re-expressed as exclude_fields + match_enrich;
  - aggregation previous-period enrichment (agg:214-238, 369-408):
    attach <metric>Previous<Period> columns via previous_period_join (J1),
    month windows calendar-aware.

The HTTP import itself (S5 pagination) lives in sources/connectors — this
module is the relational part and runs identically on fixture parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.modules import register
from dawis_spark.operators.enrich import exclude_fields, match_enrich
from dawis_spark.operators.period import previous_period_join


@register("gsc")
def evaluate(data: DataFrame, config: dict) -> DataFrame:
    """config:
      excludeInputFields: [col, ...]
      matches: [{inputField, outputField, fallback, expressions: [...]}]
      previousPeriods: {keys: [...], dateColumn: str,
                        metrics: [...], periods: ["Day","Month"]}
    """
    out = exclude_fields(data, config.get("excludeInputFields", []))
    for match in config.get("matches", []):
        out = match_enrich(
            out,
            match["inputField"],
            match["outputField"],
            match["expressions"],
            fallback=match.get("fallback", ""),
        )
    prev = config.get("previousPeriods")
    if prev:
        for period in prev.get("periods", ["Day"]):
            out = previous_period_join(
                out,
                keys=prev["keys"],
                date_col=prev["dateColumn"],
                metrics=prev["metrics"],
                period=period,
            )
    return out


def load_match_csv(spark, path: str) -> dict[str, list[str]]:
    """S11 CSV match-list scan (google_search_console.py op:191-201,
    config/matches.example.csv): header row = output labels, column cells =
    patterns. Returns the {label: [patterns...]} shape match_enrich takes.
    """
    df = spark.read.csv(path, header=True)
    rows = df.collect()
    return {
        label: [r[label] for r in rows if r[label] is not None]
        for label in df.columns
    }


def default_match_expressions() -> list[dict]:
    """The config/matches.example.csv:1-4 shape as expression dicts —
    page-type labeling by extension/path family."""
    return [
        {"regex": r"\.html$", "output": "html"},
        {"regex": r"\.pdf$", "output": "pdf"},
        {
            "csv": {"product": ["/shop/", "/product"], "blog": ["/blog/"]},
            "useRegex": False,
            "caseSensitive": False,
        },
    ]
