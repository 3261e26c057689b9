"""Adjudicated partition-less windows — the adjudication as CODE.

A Window with no partition spec moves its whole input to one task
(WindowExec's "No Partition Defined for Window operation" WARN) — the
single-sort face-plant at 100 TB. It is acceptable ONLY when the
windowed relation is bounded by something other than data size: a
calendar day spine, a top-N candidate pool, a <=n_buckets count
relation, B bootstrap replicates, a category domain.

Until round 12 that adjudication lived as prose — a dict in
tests/test_plan_properties.py that grew ~1 entry per 3.5 new queries
(43 at its peak). From round 13 the prose list is FROZEN (it may only
shrink; tests/test_plan_properties.py pins that) and every NEW query
that needs an ordered global window over a bounded relation must route
through :func:`bounded_window`, which

  * rejects any bound class outside the closed :data:`BOUND_CLASSES`
    vocabulary (an unbounded relation has no class to claim),
  * requires a human-readable reason naming the bound, and
  * registers the (query, class, reason) at PLAN-BUILD time in
    :data:`BOUNDED_WINDOW_REGISTRY`, which the inventory-wide plan pin
    unions with the frozen legacy list.

So "this window is safe" is an assertion the build itself makes and the
plan test consumes — not a growing prose table a reviewer must trust.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql.window import WindowSpec

# The closed vocabulary of relation bounds that make a single-task
# ordered window survivable at any data scale. Each class names WHY the
# windowed relation stops growing with the data:
BOUND_CLASSES: frozenset[str] = frozenset(
    {
        # calendar-bounded series: one row per day/week/month in the
        # observation window — grows with TIME, not data volume
        "day-spine",
        # top-N / per-query retrieval pools: LIMIT'd upstream
        "candidate-pool",
        # the <=n_buckets count relation of a two-level prefix-sum
        "bucket-counts",
        # B bootstrap / permutation / simulation replicates
        "replicates",
        # category-cardinality relations: event types, digits, nations
        "category-domain",
        # TakeOrdered / limit(k) vocabulary or model-state results
        "vocab-limit",
    }
)

# query name -> {(bound_class, reason): n_windows}; populated at
# plan-build time. Keyed by (class, reason) so a rebuilt plan
# re-registers idempotently; DISTINCT windows in one query need
# distinct reasons (or one registration with n_windows > 1), because
# the plan pin compares the query's partition-less Window NODE count
# against the SUM of registered n_windows — a later unregistered
# window added to an already-adjudicated query fails the pin instead
# of riding its neighbor's adjudication (the r13 query-granular hole).
BOUNDED_WINDOW_REGISTRY: dict[str, dict[tuple[str, str], int]] = {}


def _register(
    query_name: str, bound_class: str, reason: str, n_windows: int
) -> None:
    if bound_class not in BOUND_CLASSES:
        raise ValueError(
            f"bounded_window({query_name!r}): unknown bound class"
            f" {bound_class!r}; pick one of {sorted(BOUND_CLASSES)}"
            " or redesign the query onto range_partitioned_ranks"
        )
    if not reason or not reason.strip():
        raise ValueError(
            f"bounded_window({query_name!r}): an explicit reason naming"
            " the row bound is required"
        )
    if n_windows < 1:
        raise ValueError(
            f"bounded_window({query_name!r}): n_windows must be >= 1"
        )
    BOUNDED_WINDOW_REGISTRY.setdefault(query_name, {})[
        (bound_class, reason.strip())
    ] = n_windows


def registered_window_count(query_name: str) -> int:
    """Total partition-less Window nodes this query has adjudicated."""
    return sum(BOUNDED_WINDOW_REGISTRY.get(query_name, {}).values())


def bounded_window(
    query_name: str, bound_class: str, reason: str, *order_cols
) -> WindowSpec:
    """An ordered, partition-less WindowSpec whose input the CALLER
    asserts is bounded — the assertion is checked (closed class
    vocabulary, non-empty reason) and registered so the plan pin can
    see it. Chain ``.rowsBetween`` / ``.rangeBetween`` on the result as
    usual.

    Raises at plan-build time — not in a test, not at runtime — if the
    claimed bound class is not one of :data:`BOUND_CLASSES`."""
    _register(query_name, bound_class, reason, 1)
    return Window.orderBy(*order_cols)


def register_bounded(
    query_name: str, bound_class: str, reason: str, n_windows: int = 1
) -> None:
    """Assertion-only form of :func:`bounded_window` for queries whose
    partition-less windows are built inside a SHARED operator (acf,
    rrf_fuse, ...): the operator's window spec is generic, but whether
    its input relation is bounded is a property of THIS query's input —
    so the query function makes the claim, at plan-build time, naming
    how many such window nodes its plan is entitled to
    (``n_windows``)."""
    _register(query_name, bound_class, reason, n_windows)
