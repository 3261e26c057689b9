"""Slowly-changing-dimension maintenance (SCD type 2) — the warehouse
MERGE every dimensional model runs on each load.

Given the current dimension state (one open row per key, closed rows
carrying their validity interval) and a batch of updates (one row per
key with the new tracked attributes), produce the next state:

  - key absent from the dimension      → INSERT an open row
  - tracked attributes changed         → CLOSE the open row (valid_to =
                                         batch time, is_current = false)
                                         and INSERT the new open version
  - attributes unchanged / key untouched → row passes through

This is a pure batch transform (state in, state out), which is what
makes it engine-checkable — the DuckDB oracle replays the same CTEs.
Executed against a real warehouse it is the body of ``MERGE INTO`` /
``foreachBatch`` (streaming/stream.run_foreach_batch supplies the
exactly-once harness; catalog.Warehouse.write the atomic replace).

Scale shape: one equi-join of the OPEN slice against the (much smaller)
update batch on the dimension key, plus unions — no window, no skew
surface beyond the key join (dimension keys are unique on both sides).
On a 100 TB warehouse the dimension is bucketed by key
(catalog.write_bucketed) so the per-load join co-locates, and closed
history never rewrites: only the open slice and the new versions move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Next dimension state. ``current`` columns: keys + tracked +
    (from_col, to_col, flag_col); ``updates``: keys + tracked, at most
    one row per key. ``batch_ts``: the load's effective timestamp
    (SQL timestamp literal body, e.g. '2024-06-01 00:00:00')."""
    ts = F.expr(f"timestamp '{batch_ts}'")
    open_rows = current.where(F.col(flag_col))
    closed_rows = current.where(~F.col(flag_col))

    upd = updates.select(
        *key_cols, *[F.col(c).alias(f"__new_{c}") for c in tracked_cols]
    )
    cmp = open_rows.join(upd, key_cols, "left")
    changed_pred = F.coalesce(
        ~F.struct(*[F.col(c) for c in tracked_cols]).eqNullSafe(
            F.struct(*[F.col(f"__new_{c}") for c in tracked_cols])
        ),
        F.lit(False),
    )
    # open rows whose update differs: close them at batch_ts
    closing = cmp.where(changed_pred).select(
        *key_cols,
        *tracked_cols,
        F.col(from_col),
        ts.alias(to_col),
        F.lit(False).alias(flag_col),
    )
    # open rows untouched or unchanged: pass through
    passing = cmp.where(~changed_pred).select(
        *key_cols, *tracked_cols, from_col, to_col, flag_col
    )
    # new versions: changed keys + brand-new keys
    existing_keys = open_rows.select(*key_cols)
    fresh = updates.join(existing_keys, key_cols, "left_anti")
    changed_new = cmp.where(changed_pred).select(
        *key_cols, *[F.col(f"__new_{c}").alias(c) for c in tracked_cols]
    )
    inserts = changed_new.unionByName(
        fresh.select(*key_cols, *tracked_cols)
    ).select(
        *key_cols,
        *tracked_cols,
        ts.alias(from_col),
        F.lit(None).cast("timestamp").alias(to_col),
        F.lit(True).alias(flag_col),
    )
    cols = [*key_cols, *tracked_cols, from_col, to_col, flag_col]
    return (
        closed_rows.select(*cols)
        .unionByName(passing.select(*cols))
        .unionByName(closing.select(*cols))
        .unionByName(inserts.select(*cols))
    )


def scd2_oracle_ctes(
    current_cte: str,
    updates_cte: str,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> str:
    """DuckDB replay ending in ``scd2(keys..., tracked..., valid_from,
    valid_to, is_current)``."""
    keys = ", ".join(key_cols)
    tracked = ", ".join(tracked_cols)
    on = " AND ".join(f"o.{c} = u.{c}" for c in key_cols)
    diff = " OR ".join(
        f"o.{c} IS DISTINCT FROM u.{c}" for c in tracked_cols
    )
    o_cols = ", ".join(f"o.{c}" for c in [*key_cols, *tracked_cols])
    u_cols = ", ".join(f"u.{c}" for c in [*key_cols, *tracked_cols])
    ts = f"TIMESTAMP '{batch_ts}'"
    return f"""scd2_open AS (
  SELECT * FROM {current_cte} WHERE {flag_col}
),
scd2_closed AS (
  SELECT {keys}, {tracked}, {from_col}, {to_col}, {flag_col}
  FROM {current_cte} WHERE NOT {flag_col}
),
scd2_closing AS (
  SELECT {o_cols}, o.{from_col}, {ts} AS {to_col}, FALSE AS {flag_col}
  FROM scd2_open o JOIN {updates_cte} u ON {on}
  WHERE {diff}
),
scd2_passing AS (
  SELECT {o_cols}, o.{from_col}, o.{to_col}, o.{flag_col}
  FROM scd2_open o LEFT JOIN {updates_cte} u ON {on}
  WHERE u.{key_cols[0]} IS NULL OR NOT ({diff})
),
scd2_inserts AS (
  SELECT {u_cols}, {ts} AS {from_col},
         CAST(NULL AS TIMESTAMP) AS {to_col}, TRUE AS {flag_col}
  FROM scd2_open o JOIN {updates_cte} u ON {on} WHERE {diff}
  UNION ALL
  SELECT {u_cols}, {ts}, CAST(NULL AS TIMESTAMP), TRUE
  FROM {updates_cte} u LEFT JOIN scd2_open o ON {on}
  WHERE o.{key_cols[0]} IS NULL
),
scd2 AS (
  SELECT * FROM scd2_closed
  UNION ALL
  SELECT {keys}, {tracked}, {from_col}, {to_col}, {flag_col} FROM scd2_passing
  UNION ALL SELECT * FROM scd2_closing
  UNION ALL SELECT * FROM scd2_inserts
)"""


def scd2_asof(
    dim: DataFrame,
    ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Time-travel read of an SCD2 dimension: the version of every key
    that was in effect at ``ts`` (half-open validity: from <= ts < to,
    open rows have NULL ``to``) — the query-side payoff of keeping
    history that scd2_apply maintains; joins facts "as of" their event
    time against it.

    Map-side filter only; on a dimension bucketed by key (the load-join
    layout) an as-of fact join stays co-located. Keys born after ``ts``
    are naturally absent.
    """
    t = F.expr(f"timestamp '{ts}'")
    return dim.where(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )
