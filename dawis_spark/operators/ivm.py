"""Incremental view maintenance for JOIN views (the delta rule).

operators/rollup.py maintains AGGREGATE views incrementally; this
module does the same for the other expensive materialization — a
denormalized fact⋈dim join view — under the two change kinds a
warehouse tick delivers: fact APPENDS and dimension UPDATES. The
classic delta rule (Blakeley et al. 1986, view maintenance; the shape
differential/DBSP systems generalize):

    V' = (V ⊖ V[changed dim keys])        -- retract stale join rows
       ⊕ (V[changed].fact ⋈ D_new)        -- re-derive them from the view itself
       ⊕ (ΔF ⋈ D_new)                     -- join only the new facts

The view already CONTAINS the fact columns, so re-derivation never
touches the fact table — dimension churn costs one pass over the view
plus deltas-sized joins, and fact appends cost only ΔF ⋈ D. A full
refresh re-joins ALL history every tick; at 100 TB that difference is
the whole game.

Scale: ``changed_keys`` and ``ΔF`` are tick-sized; the one full-view
pass prunes by join key when the view is written partitioned/bucketed
by it (catalog.write_bucketed — the same layout that co-locates the
re-derive join). Nothing history-sized shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_join_view(
    view: DataFrame,
    fact_delta: DataFrame,
    dim_new: DataFrame,
    changed_keys: DataFrame,
    key_cols: list[str],
    dim_cols: list[str],
) -> DataFrame:
    """Next state of a fact⋈dim join view.

    ``view``: current view (fact columns incl. ``key_cols`` +
    ``dim_cols``). ``fact_delta``: newly appended fact rows (fact
    columns). ``dim_new``: the FULL new dimension state (key_cols +
    dim_cols). ``changed_keys``: the dim keys whose attributes changed
    this tick (tick-sized; broadcast into both view passes).
    """
    ck = F.broadcast(changed_keys.select(*key_cols).distinct())
    unaffected = view.join(ck, key_cols, "left_anti")
    rederived = (
        view.join(ck, key_cols, "left_semi")
        .drop(*dim_cols)
        .join(dim_new, key_cols)
    )
    appended = fact_delta.join(dim_new, key_cols)
    return unaffected.unionByName(rederived).unionByName(appended)
