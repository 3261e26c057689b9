"""Previous-period enrichment join (J1) — the reference's most intricate
relational logic.

Reference semantics (modules/aggregation/custom/google_search_console.py:
214-238, 369-408): after importing a day's rows, look up the matching row
from the previous day / week / month / year on the full dimension key and
attach ``<metric>Previous<Period>`` columns. Month boundaries use calendar
months (monthrange), not 30-day offsets.

Spark-first: the per-row ``find_one`` lookup becomes ONE left join of the
current slice against the previous-period slice, shuffling both sides on
the dimension key once. For day-partitioned facts the previous slice is a
single pruned partition — at 100 TB the join reads two day-partitions, not
the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PERIOD_OFFSET = {
    "Day": lambda c: F.date_add(c, -1),
    "Week": lambda c: F.date_add(c, -7),
    "Month": lambda c: F.add_months(c, -1),
    "Year": lambda c: F.add_months(c, -12),
}


def previous_period_offset(date_col: Column, period: str) -> Column:
    """The date in the previous period that corresponds to ``date_col``.

    Calendar-aware for Month/Year via ``add_months`` (clamps Jan 31 -> Feb 28
    the same way the reference's monthrange logic does)."""
    try:
        return _PERIOD_OFFSET[period](date_col)
    except KeyError:
        raise ValueError(f"period must be one of {list(_PERIOD_OFFSET)}, got {period!r}")


def previous_period_join(
    df: DataFrame,
    keys: list[str],
    date_col: str,
    metrics: list[str],
    period: str = "Day",
) -> DataFrame:
    """Attach ``<metric>Previous<Period>`` columns via a self left join.

    Keys present only in the current period get NULL previous columns
    (reference leaves them unset -> NULLABLE schema,
    google_search_console.py:505-513).
    """
    prev_date_in_current = previous_period_offset(F.col(date_col), period)
    prev = df.select(
        *[F.col(k).alias(f"__p_{k}") for k in keys],
        F.col(date_col).alias("__p_date"),
        *[F.col(m).alias(f"{m}Previous{period}") for m in metrics],
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__p_{k}"))
    cond = cond & (prev_date_in_current.cast("date") == F.col("__p_date").cast("date"))
    joined = df.join(prev, cond, "left")
    return joined.drop(*[f"__p_{k}" for k in keys], "__p_date")
