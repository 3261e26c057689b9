"""Bloom-filter runtime join pruning — the explicit form of the
"runtime filter" / dynamic-partition-pruning trick every warehouse
engine plays on selective star joins.

A semi join ``fact ⋉ (filtered dim)`` normally shuffles the FULL fact
side on the join key before the dim predicate can discard anything.
When the filtered dim key set is small, a Bloom filter built from it and
broadcast to the fact scan rejects almost every non-matching fact row
map-side, BEFORE the exchange — at 100 TB that turns a full-fact shuffle
into a shuffle of the ~matching fraction. Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects the same
shape automatically for qualifying plans; this operator makes it an
explicit, composable step (usable in front of any downstream op, not
just a join) and uses the repo's deterministic polynomial hashing so the
filter's exact false-positive set is bit-reproducible in the DuckDB
oracle — membership tests on engine-private hash functions could never
be oracle-checked.

Representation: the filter is the SORTED ARRAY of set bit positions
(≤ m ints) rather than a packed bitmap — Spark and DuckDB share array
ops but not bit-twiddling kernels, and at the design point (m = 2^13..
2^16 bits = 32..256 KiB worst case) the array broadcast is as cheap as
the bitmap's. The build aggregates distinct positions (partial agg
dedups map-side, so each task ships ≤ m ints); the probe is a
``forall(positions, p -> array_contains(bloom, p))`` against the
broadcast single-row array — whole-stage-codegen'd binary search, no
shuffle, no UDF.

False positive rate: with n distinct keys, d hashes, m bits, classic
FPR ≈ (1 - e^(-d*n/m))^d. The self-eval query measures the realized
rate against the exact semi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import text as TXT

MOD = TXT.MOD

# Same uniformizing quadratic-affine rounds as the KMV/count-min family
# (operators/sketches.py design notes): the raw polynomial hash is not
# equidistributed on short decimal keys, and Bloom bucket spread assumes
# uniform hashes.
_ROUNDS = ((48271, 11), (69621, 137))


def _coeffs(d: int) -> list[tuple[int, int]]:
    return [(2 * i + 3, 97 * i + 13) for i in range(d)]


def _positions_sql(key_expr: str, m: int, d: int, dialect: str) -> str:
    """Array expression of the d bit positions of ``key_expr``.

    The char hash and each mixing round are BOUND through one-element
    transform stages: every round references its input 3x and every
    position references the mixed value, so naive textual nesting would
    re-evaluate the O(len) hash fold 3^rounds * d times per row — the
    expression-blowup trap operators/sketches.py documents."""
    h = TXT.char_hash(
        f"cast({key_expr} as {'string' if dialect == 'spark' else 'varchar'})",
        dialect,
    )
    pos = [
        f"cast((({a} * __x + {b}) % {MOD}) % {m} as int)" for a, b in _coeffs(d)
    ]
    if dialect == "spark":
        out = f"array({h})"
        for a, b in _ROUNDS:
            out = f"transform({out}, __x -> (__x * __x + {a} * __x + {b}) % {MOD})"
        return f"(transform({out}, __x -> array({', '.join(pos)})))[0]"
    out = f"[{h}]"
    for a, b in _ROUNDS:
        out = f"list_transform({out}, __x -> (__x * __x + {a} * __x + {b}) % {MOD})"
    return f"(list_transform({out}, __x -> [{', '.join(pos)}]))[1]"


def bloom_build(keys: DataFrame, key_col: str, m: int = 8192, d: int = 3) -> DataFrame:
    """Build the filter from the (small, already-filtered) key set:
    a single-row DataFrame ``(bloom: array<int>)`` of sorted distinct
    bit positions.

    Plan shape: positions explode map-side; ``collect_set`` partial
    aggregation dedups inside each task, so the single-partition merge
    receives ≤ m ints per task — the build never shuffles key volume.
    """
    pos = keys.select(
        F.explode(F.expr(_positions_sql(key_col, m, d, "spark"))).alias("p")
    )
    return pos.agg(F.array_sort(F.collect_set("p")).alias("bloom"))


def bloom_probe(
    fact: DataFrame, key_col: str, bloom: DataFrame, m: int = 8192, d: int = 3
) -> DataFrame:
    """Keep the fact rows whose key passes the filter (all d positions
    set). The single-row position array is broadcast; the membership
    test runs inside the fact scan's codegen stage — zero shuffle.
    Output = exact semi-join survivors plus a deterministic
    false-positive residue (bounded by the FPR); follow with the real
    join for exactness, or accept the residue where the consumer
    tolerates it (pre-aggregation pruning).
    """
    probed = fact.crossJoin(F.broadcast(bloom))
    keyed = probed.withColumn(
        "__pos", F.expr(_positions_sql(key_col, m, d, "spark"))
    )
    return (
        keyed.where(F.expr("forall(__pos, p -> array_contains(bloom, p))"))
        .drop("__pos", "bloom")
    )


def bloom_oracle_ctes(
    build_cte: str, key_col: str, m: int, d: int
) -> str:
    """DuckDB replay: CTE chain ending in ``bloom(bloom)`` — the same
    sorted distinct position list. ``build_cte`` must expose the key
    rows under ``key_col``."""
    pos = _positions_sql(key_col, m, d, "duck")
    return (
        f"bloom_pos AS (SELECT unnest({pos}) AS p FROM {build_cte}),\n"
        f"bloom AS (SELECT list_sort(list(DISTINCT p)) AS bloom FROM bloom_pos)"
    )


def bloom_probe_pred(key_col: str, m: int, d: int) -> str:
    """DuckDB boolean predicate: key passes the broadcast ``bloom`` list
    (requires a cross join against the ``bloom`` CTE)."""
    pos = _positions_sql(key_col, m, d, "duck")
    return (
        f"len(list_filter({pos}, p -> list_contains(bloom, p))) = {d}"
    )
