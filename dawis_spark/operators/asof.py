"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key — the temporal join Spark's DataFrame API
lacks (kdb aj, pandas merge_asof, DuckDB ASOF JOIN).

Spark-first formulation: NOT a per-row subquery and NOT a range cross
join. Both sides are tagged and unioned, then ONE window per key carries
the latest right-side payload forward (``last(..., ignorenulls=True)``
over rows unbounded-preceding..current). That is a single hash shuffle
on the key plus a sort within partitions — the merge-join shape, linear
in |L| + |R|, no row inflation. A backward range join (left x right with
``r.ts <= l.ts``) inflates by the average history length per key; this
never does.

Ordering contract: rows sort by (time, side, order_col) with right rows
first at equal times, so "at or before" is inclusive and ties among
right rows resolve to the greatest ``right_order`` — deterministic
across engines (the oracle mirror is ORDER BY ts DESC, order DESC LIMIT 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    time_col: str,
    payload_cols: list[str],
    right_order: str | None = None,
    right_time_as: str | None = None,
) -> DataFrame:
    """Left rows + the latest ``payload_cols`` from ``right`` whose
    ``time_col`` is <= the left row's, matching on ``keys``.

    ``right_order`` breaks ties among right rows sharing a timestamp
    (defaults to the first payload column). Unmatched left rows keep
    NULL payloads (left-join semantics). ``right_time_as`` additionally
    exposes the matched right row's timestamp under that name.
    """
    right_order = right_order or payload_cols[0]
    carry = F.struct(
        F.col(time_col).alias("__t"), *[F.col(c) for c in payload_cols]
    )
    l_cols = [c for c in left.columns]
    r_side = right.select(
        *keys,
        F.col(time_col),
        F.lit(0).alias("__side"),
        F.col(right_order).alias("__ord"),
        carry.alias("__carry"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_cols if c not in keys and c != time_col],
    )
    l_side = left.select(
        *keys,
        F.col(time_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_order].dataType).alias("__ord"),
        F.lit(None).cast(r_side.schema["__carry"].dataType).alias("__carry"),
        *[F.col(c) for c in l_cols if c not in keys and c != time_col],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col), F.col("__side"), F.col("__ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_side.unionByName(l_side).withColumn(
        "__last", F.last("__carry", ignorenulls=True).over(w)
    )
    out_payload = [
        F.col(f"__last.{c}").alias(c) for c in payload_cols
    ]
    if right_time_as is not None:
        out_payload.append(F.col("__last.__t").alias(right_time_as))
    return (
        carried.filter(F.col("__side") == 1)
        .select(*keys, time_col,
                *[F.col(c) for c in l_cols if c not in keys and c != time_col],
                *out_payload)
    )
