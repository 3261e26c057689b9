"""Incremental rollup maintenance — continuous aggregates without history
recompute.

The hypertable_rollup query materializes multi-grain aggregates in one
pass; THIS module keeps such a rollup current as new fact slices land
(cron micro-batches, §2.9): each tick aggregates ONLY the new rows into
partials and merges them with the stored rollup.

The invariant that makes this correct is re-aggregatability: the rollup
stores SUM-able partials (counts, sums, mins, maxes) and derived metrics
(averages, rates) are computed at read time — so
``merge(rollup, agg(batch)) == agg(all facts)`` for any batch split.
Oracle-checked end to end by the incremental_rollup_2ticks query, which
must hash-match a single-shot GROUP BY over the full fact table.

Scale shape: the per-tick cost is one groupBy over the NEW slice (small)
plus one groupBy over (rollup ∪ batch-partials) — the rollup relation is
grain-sized (days × keys), orders of magnitude smaller than the fact
table, so maintenance cost is independent of history size. The rewrite
uses Warehouse.replace (temp dir + directory swap), which is safe even
though the merged plan reads the table being replaced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dawis_spark.catalog import Warehouse

# merge function per partial kind: how two partials of the same key combine
_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}


def rollup_partials(
    facts: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, Column]],
) -> DataFrame:
    """Aggregate a fact slice into partials.

    ``measures``: output column -> (merge kind, aggregation expr), e.g.
    ``{"n": ("sum", F.count(F.lit(1))), "v_sum": ("sum", F.sum("value")),
    "v_min": ("min", F.min("value"))}``. The merge kind must re-aggregate
    the expr correctly (count merges by sum; min by min).
    """
    return facts.groupBy(*group_cols).agg(
        *[expr.alias(name) for name, (_, expr) in measures.items()]
    )


def update_rollup(
    wh: Warehouse,
    rollup_table: str,
    new_facts: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, Column]],
) -> DataFrame:
    """One maintenance tick: merge the new slice's partials into the
    stored rollup and atomically replace the table. Returns the merged
    rollup DataFrame (reading the updated table).

    Pair with ProcessedLog / idempotent_append upstream so each fact row
    enters exactly one tick — the merge itself is then exactly-once.
    """
    batch = rollup_partials(new_facts, group_cols, measures)
    if wh.exists(rollup_table):
        merged = (
            wh.read(rollup_table)
            .unionByName(batch)
            .groupBy(*group_cols)
            .agg(
                *[
                    _MERGE[kind](name).alias(name)
                    for name, (kind, _) in measures.items()
                ]
            )
        )
    else:
        merged = batch
    wh.replace(merged, rollup_table)
    return wh.read(rollup_table)
