"""Numeric-string parsing helpers (S8 Sistrix semantics).

Reference (modules/aggregation/custom/sistrix_optimizer.py:230-273):
a ranking ``position`` may be NULL, an int, a numeric string, or an
overflow marker like ``">100"``:
  - numeric         -> position = int(value),  overflow = false
  - trailing digits -> position = those digits, overflow = true
  - neither         -> API error (here: NULL position, overflow NULL —
    Spark pipelines filter/flag instead of raising mid-job)
``traffic`` parses to int only when numeric, else NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_position(col: Column) -> Column:
    """struct<position:int, positionOverflow:boolean> from a raw string."""
    trimmed = F.trim(col.cast("string"))
    is_numeric = trimmed.rlike(r"^\d+$")
    trailing = F.regexp_extract(trimmed, r"(\d+)$", 1)
    position = (
        F.when(col.isNull(), F.lit(None).cast("int"))
        .when(is_numeric, trimmed.cast("int"))
        .when(trailing != "", trailing.cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )
    overflow = (
        F.when(col.isNull(), F.lit(False))
        .when(is_numeric, F.lit(False))
        .when(trailing != "", F.lit(True))
        .otherwise(F.lit(None).cast("boolean"))
    )
    return F.struct(position.alias("position"), overflow.alias("positionOverflow"))


def parse_int_or_null(col: Column) -> Column:
    """int iff the string is purely numeric, else NULL (traffic parse)."""
    trimmed = F.trim(col.cast("string"))
    return F.when(trimmed.rlike(r"^\d+$"), trimmed.cast("int")).otherwise(
        F.lit(None).cast("int")
    )
