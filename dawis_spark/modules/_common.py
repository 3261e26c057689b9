"""Shared check-row emission for operation modules.

Reference: service/check.py:27-57 — every check lands as
(created, urlset, check, value, valid, diff, error, url RECORD) with the
value always stringified (:45). One helper builds that projection so each
module's checks are narrow map-side selects unioned into one plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def emit_checks(
    df: DataFrame,
    check_name: str,
    valid: Column,
    value: Column | None = None,
    diff: Column | None = None,
    error: Column | None = None,
) -> DataFrame:
    """Project one check per input row into the normalized checks schema.

    ``df`` must carry ``urlset`` and ``url`` (struct) columns; ``created``
    is stamped at evaluation time like the reference's utcnow.
    """
    return df.select(
        F.current_timestamp().alias("created"),
        F.col("urlset"),
        F.lit(check_name).alias("check"),
        (value if value is not None else F.lit("")).cast("string").alias("value"),
        valid.cast("boolean").alias("valid"),
        (diff if diff is not None else F.lit("")).cast("string").alias("diff"),
        (error if error is not None else F.lit("")).cast("string").alias("error"),
        F.col("url"),
    )


def union_checks(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lower_headers(headers: Column) -> Column:
    """P8: lowercase header keys AND values before lookup
    (responseheader.py:91 dict comprehension)."""
    return F.map_from_arrays(
        F.transform(F.map_keys(headers), lambda k: F.lower(k)),
        F.transform(F.map_values(headers), lambda v: F.lower(v)),
    )
