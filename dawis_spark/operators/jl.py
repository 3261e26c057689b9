"""Johnson–Lindenstrauss random-projection dimensionality reduction —
the cheap-and-cheerful rung UNDER the quantization ladder (PQ/SQ8/BQ
compress codes; JL compresses the GEOMETRY: project to d' << d with a
±1 matrix and search in the small space; Achlioptas 2003 shows the
database-friendly ±1 entries satisfy the JL lemma).

Determinism: the sign matrix is the integer formula
``s(i, j) = 1 - 2 * ((i * 53 + j * 97) % 2)`` evaluated inline in BOTH
engines (the projection_plane_expr convention), and each projected
component is a FIXED-ORDER fold over input dims — float rounding is
identical because the operation sequence is identical, the same
argument the repo's cosine fragments rely on. No Python-side matrix, no
literals to ship.

Scale shape: projection is pure map-side codegen (d x d' multiply-adds
per row inside the scan); downstream search runs on d'-dim arrays so
every distance costs d'/d of the original — the standard pre-filter in
front of an exact re-rank. The self-eval (ann_recall_jl) prices the
recall of 64 -> 16 dims honestly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jl_sign(i_expr: str, j: int) -> str:
    return f"(1 - 2 * (({i_expr} * 53 + {j} * 97) % 2))"


def project_expr(vec_ref: str, dim: int, out_dim: int, dialect: str) -> str:
    """SQL: array<double> of ``out_dim`` fixed-order ±1 folds."""
    comps = []
    for j in range(out_dim):
        if dialect == "spark":
            # Spark [] is 0-based; DuckDB [] is 1-based — same fold order
            comps.append(
                f"aggregate(sequence(0, {dim - 1}), cast(0 as double), "
                f"(acc, i) -> acc + cast({vec_ref}[i] as double) * {jl_sign('i', j)})"
            )
        else:
            comps.append(
                f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
                f"list_transform(range(0, {dim}), "
                f"i -> CAST({vec_ref}[i + 1] AS DOUBLE) * {jl_sign('i', j)})), "
                f"(acc, e) -> acc + e)"
            )
    sep = ", ".join(comps)
    return f"array({sep})" if dialect == "spark" else f"[{sep}]"


def jl_project(
    df: DataFrame, id_col: str, vec_col: str, dim: int, out_dim: int
) -> DataFrame:
    """(id, proj) with proj = the deterministic ±1 projection."""
    # bind the vector once: the folds reference it out_dim x dim times
    expr = project_expr("__v", dim, out_dim, "spark")
    return df.select(F.col(id_col), F.col(vec_col).alias("__v")).select(
        F.col(id_col), F.expr(expr).alias("proj")
    )
