"""Snapshot table diff — the CDC/reconciliation primitive: given two
versions of a keyed table, classify every key as added / removed /
changed (with the exact set of changed columns) — what a warehouse runs
after every load to validate an upsert, reconcile a replica, or emit a
change feed for the IVM family (operators/ivm.py consumes exactly these
deltas; operators/scd.py writes history from them).

Semantics: full outer join on the key; a column counts as changed under
NULL-SAFE equality (NULL vs NULL is equal, NULL vs value is a change) —
the IS NOT DISTINCT FROM rule, matching SCD2's change predicate.
``changed_cols`` is the comma-joined sorted list of differing columns,
so the output is fully deterministic.

Scale shape: ONE co-keyed full outer join (both sides hash on the key;
AQE picks SMJ/shuffled-hash by size) and map-side comparison
expressions — no window, no driver state, output bounded by the churn,
not the table. At 100 TB the standard accelerations compose on top:
snapshot pruning by partition column and a pre-filter on a per-row
content hash (xxhash64 of the compared columns) so only differing rows
reach the join — noted here, not defaulted, because the hash pre-filter
changes the scan shape and belongs to the caller's layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff: (key..., status, changed_cols) where status in
    ('added', 'removed', 'changed'); unchanged rows are dropped."""
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, [f"k_{c}" for c in key_cols], "full_outer")
    changed_flags = [
        F.when(
            ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
        ).otherwise(F.lit(None))
        for c in sorted(compare_cols)
    ]
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.withColumn(
            "changed_cols",
            F.array_join(
                F.filter(F.array(*changed_flags), lambda x: x.isNotNull()), ","
            ),
        )
        .withColumn("status", status)
        .filter(
            (F.col("status") != "changed") | (F.col("changed_cols") != "")
        )
        .select(
            *[F.col(f"k_{c}").alias(c) for c in key_cols],
            "status",
            F.when(F.col("status") == "changed", F.col("changed_cols"))
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )


def diff_oracle_sql(
    old_sql: str, new_sql: str, key_cols: list[str], compare_cols: list[str]
) -> str:
    """DuckDB replay over two snapshot subqueries."""
    keys = ", ".join(key_cols)
    on = " AND ".join(f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in key_cols)
    changed_list = ", ".join(
        f"CASE WHEN NOT (o.{c} IS NOT DISTINCT FROM n.{c}) THEN '{c}' END"
        for c in sorted(compare_cols)
    )
    key_out = ", ".join(
        f"COALESCE(o.{c}, n.{c}) AS {c}" for c in key_cols
    )
    return f"""
WITH o AS ({old_sql}), n AS ({new_sql}),
j AS (
  SELECT {key_out},
         CASE WHEN o.{key_cols[0]} IS NULL THEN 'added'
              WHEN n.{key_cols[0]} IS NULL THEN 'removed'
              ELSE 'changed' END AS status,
         array_to_string(list_filter([{changed_list}], x -> x IS NOT NULL), ',') AS changed_cols
  FROM o FULL OUTER JOIN n ON {on})
SELECT {keys}, status,
       CASE WHEN status = 'changed' THEN changed_cols ELSE '' END AS changed_cols
FROM j
WHERE status <> 'changed' OR changed_cols <> ''
"""
