"""Skew-aware join: key salting for hot keys.

AQE's skew-join split (on in session.py) handles most skew at runtime, but
it only splits SORT-MERGE join partitions. When a dimension must join a
fact on a pathologically hot key (one domain owning half the corpus, a
null-ish default key), explicit salting still wins: replicate the small
side R times, scatter the big side's hot keys across R salt buckets, join
on (key, salt). Classic public technique (e.g. Spark summit talks; LRU
skew handling in Hive/Spark docs).

Cost model: replication multiplies the SMALL side by R (bounded), in
exchange for an R-way fan-out of the hot partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` ⋈ ``small`` on ``key`` with the big side salted.

    The big side gets a uniform random salt in [0, R); the small side is
    exploded once per salt value, so every (key, salt) pair finds its
    match. Correct for inner and left joins (every big row keeps exactly
    one matching salt replica per key match).
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
