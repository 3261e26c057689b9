"""Idempotent append — exactly-once-per-partition write semantics.

Reference semantics (P12/A1, google_search_console.py:516-549): before an
import, ``SELECT COUNT(*) WHERE date = D AND property = P``; any rows ->
skip the whole (property, date) slice (skip-if-present, NOT merge —
SURVEY §7.5(2) warns results diverge if this becomes a merge).

Spark-first: the COUNT-probe becomes a left-anti join of the incoming
batch's key slice against the target's existing keys — one pass, no
read-modify-write race window at the row level, and at 100 TB the anti
join prunes to the touched partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def filter_new_slices(
    batch: DataFrame, existing: DataFrame | None, slice_keys: list[str]
) -> DataFrame:
    """Drop every batch row whose slice key combination already exists.

    Whole-slice semantics: if ANY row of (keys...) exists in the target,
    the incoming slice is skipped entirely — matching the reference's
    _DataAlreadyExistError behavior.
    """
    if existing is None:
        return batch
    present = existing.select(*slice_keys).distinct()
    return batch.join(F.broadcast(present), slice_keys, "left_anti")


def idempotent_append(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    slice_keys: list[str],
    partition_by: list[str] | None = None,
) -> int:
    """Append only not-yet-present slices to a parquet table; returns the
    number of rows written. Re-running the same import is a no-op."""
    import os

    existing = spark.read.parquet(path) if os.path.exists(path) else None
    fresh = filter_new_slices(batch, existing, slice_keys)
    fresh = fresh.cache()
    n = fresh.count()
    if n:
        writer = fresh.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    fresh.unpersist()
    return n
