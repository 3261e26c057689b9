"""Window-function operators: latest-per-key, change detection, top-k.

Reference semantics:
  - W1/J4 latest snapshot: Mongo ``find_last_sorted`` (sort date desc,
    limit 1) per URL — database/mongodb.py:128-131, metatags.py:224-234.
  - W2 change detection: compare a doc's value against the previous
    snapshot for the same URL; emit a check with the old value as ``diff``
    — metatags.py:209-275 (title), 517-583 (description).
  - W4 top-k: LIMIT with ordering.

Spark-first: all are one-pass window functions over a single shuffle on the
partition key. At 100 TB the shuffle is unavoidable (per-key ordering), but
a single window spec is reused so consecutive operators share the exchange.
Deterministic tie-breaks are mandatory: synthetic or real data can carry
equal timestamps, and a nondeterministic row_number makes results flap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """W1: the most recent row per key. ``order_by`` must be a total order
    (pass a unique id as the last column)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def change_detection(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    value_col: str,
) -> DataFrame:
    """W2: rows whose ``value_col`` differs from the previous snapshot of the
    same key; previous value returned as ``diff`` (reference emits it in the
    check's diff field, metatags.py:246-258)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("diff", prev)
        .filter(F.col("diff").isNotNull() & (F.col(value_col) != F.col("diff")))
    )


def top_k_per_group(
    df: DataFrame, keys: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """W4: k best rows per group. row_number (not rank) so ties don't
    inflate the output; break ties in ``order_by``."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )
