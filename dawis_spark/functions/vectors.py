"""Vector math fragments, dual-rendered for Spark SQL and DuckDB.

Same structural-parity approach as functions/text.py: one definition,
two renderings, identical left-to-right double summation so the oracle
comparison is exact to the last ulp (we still round presented scores).

Spark arrays are 0-based, DuckDB 1-based; both sides cast FLOAT elements to
DOUBLE *before* multiplying so neither engine does float32 intermediate math.
"""

from __future__ import annotations


def dot(a: str, b: str, dialect: str) -> str:
    """Sequential double dot product of two float-array columns."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            f"cast(0 as double), (s, v) -> s + v)"
        )
    return (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> cast({a}[i] as double) * cast({b}[i] as double))), "
        f"(s, v) -> s + v)"
    )


def norm_sq(a: str, dialect: str) -> str:
    """Sequential double sum of squares."""
    if dialect == "spark":
        return (
            f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
            f"cast(0 as double), (s, v) -> s + v)"
        )
    return (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"list_transform({a}, x -> cast(x as double) * cast(x as double))), "
        f"(s, v) -> s + v)"
    )


def cosine(a: str, b: str, dialect: str) -> str:
    """cos(a, b) in double; NULL-safe only for non-zero vectors (a zero
    norm raises under Spark ANSI mode — use cosine_null for inputs that
    may contain degenerate vectors)."""
    return f"({dot(a, b, dialect)} / (sqrt({norm_sq(a, dialect)}) * sqrt({norm_sq(b, dialect)})))"


def cosine_null(a: str, b: str, dialect: str) -> str:
    """cos(a, b) in double, NULL when either vector has zero norm.

    Spark 4 runs ANSI mode by default, where x/0 throws DIVIDE_BY_ZERO;
    nullif-ing the denominator restores the NULL-on-degenerate semantics
    in both engines (DuckDB already returns NULL but renders identically
    for parity)."""
    denom = f"nullif(sqrt({norm_sq(a, dialect)}) * sqrt({norm_sq(b, dialect)}), 0)"
    return f"({dot(a, b, dialect)} / {denom})"


def l2_sq(a: str, b: str, dialect: str) -> str:
    """Sequential double squared L2 distance — the PQ sub-assignment
    metric (Jegou et al. 2011 train/encode with L2 per subspace). Same
    left-to-right fold as dot() so both engines produce bit-identical
    doubles pre-rounding."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"(cast(x as double) - cast(y as double)) * "
            f"(cast(x as double) - cast(y as double))), "
            f"cast(0 as double), (s, v) -> s + v)"
        )
    return (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> (cast({a}[i] as double) - cast({b}[i] as double)) * "
        f"(cast({a}[i] as double) - cast({b}[i] as double)))), "
        f"(s, v) -> s + v)"
    )
