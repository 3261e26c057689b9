"""Similarity search over embedding columns (array<float>).

Beyond-reference capability (BASELINE.json north star). Two paths:

  - brute-force cosine top-k: exact baseline. Plan: broadcast the (small)
    query set against the corpus — a map-side nested loop with no shuffle
    of the corpus — then per-query top-k via window. This is the right
    exact plan at any corpus size as long as the QUERY side is broadcastable.

  - LSH-bucketed ANN (sign-random-projection / SimHash for cosine,
    Charikar 2002): corpus and queries hash to sign-pattern buckets
    map-side; candidates equi-join on bucket; exact cosine only on
    candidates. At 100 TB this turns the O(N x Q) scan into a bucket join —
    the standard trade: recall < 1 for a ~buckets-fold cost cut.

Projection vectors are deterministic pseudo-random (index arithmetic), so
results are reproducible and the DuckDB oracle can generate the identical
planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import vectors as V


def _cosine_col() -> F.Column:
    return F.round(F.expr(V.cosine("q_vec", "c_vec", "spark")), 6)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k. ``queries`` must be small (it is broadcast).

    Output: (query_id, neighbor_id, cosine) with deterministic tie-break
    on neighbor_id after 6-digit rounding.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine_col().alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def projection_plane_expr(plane: int, dim: int, dialect: str) -> str:
    """Deterministic pseudo-random hyperplane: component i of plane p is
    ``((i*37 + p*101) % 17) - 8`` — integer-valued, identical in any engine.
    Returns the SQL for sign(dot(vec, plane)) as a '0'/'1' string."""
    if dialect == "spark":
        dot = (
            f"aggregate(sequence(0, {dim - 1}), cast(0 as double), "
            f"(s, i) -> s + cast(vec[i] as double) * (((i * 37 + {plane} * 101) % 17) - 8))"
        )
    else:
        dot = (
            f"list_reduce(list_prepend(cast(0 as double), "
            f"list_transform(range(1, {dim} + 1), "
            f"i -> cast(vec[i] as double) * ((((i - 1) * 37 + {plane} * 101) % 17) - 8))), "
            f"(s, v) -> s + v)"
        )
    return f"(case when {dot} >= 0 then '1' else '0' end)"


def lsh_bucket_expr(n_planes: int, dim: int, dialect: str) -> str:
    """Concatenated sign bits -> bucket key string."""
    bits = [projection_plane_expr(p, dim, dialect) for p in range(n_planes)]
    if dialect == "spark":
        return "concat(" + ", ".join(bits) + ")"
    return " || ".join(bits)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine only within the query's LSH bucket.

    Scale path: bucket assignment is map-side on both relations; the only
    shuffle is the equi-join on bucket. Recall tuned by n_planes (fewer
    planes = bigger buckets = higher recall & cost). Multi-probe or
    band-OR variants drop in by unioning more bucket keys.
    """
    from pyspark.sql import Window

    bucket = lsh_bucket_expr(n_planes, dim, "spark")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
    ).withColumn("bucket", F.expr(bucket)).withColumnsRenamed({"vec": "c_vec"})
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", F.expr(bucket)).withColumnsRenamed({"vec": "q_vec"})
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine_col().alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_ann_topk(
    corpus,
    queries,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
):
    """IVF approximate NN: bucket corpus by nearest centroid; per query,
    probe the ``n_probe`` nearest centroids' buckets only.

    Plan shape at scale: centroid set broadcasts (tiny); corpus bucket
    assignment is one map-side argmin over C centroids; the search is an
    equi-join on centroid id — the corpus never shuffles by vector, and
    cost drops by ~C/n_probe versus brute force.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dawis_spark.functions import vectors as V

    cos = V.cosine("vec", "cvec", "spark")
    centroids = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )

    def assign(df, id_alias: str, vec_alias: str, top_n: int):
        scored = (
            df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias("vec"))
            .crossJoin(F.broadcast(centroids))
            .select(
                id_alias,
                "vec",
                "cid",
                F.round(F.expr(cos), 6).alias("__aff"),
            )
        )
        w = Window.partitionBy(id_alias).orderBy(F.desc("__aff"), F.asc("cid"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= top_n)
            .select(id_alias, F.col("vec").alias(vec_alias), "cid")
        )

    corpus_b = assign(corpus, "neighbor_id", "c_vec", 1)
    queries_b = assign(queries, "query_id", "q_vec", n_probe)
    pair_cos = V.cosine("q_vec", "c_vec", "spark")
    scored = (
        queries_b.join(corpus_b, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.expr(pair_cos), 6).alias("cosine"),
        )
        .distinct()  # a neighbor can appear via several probed buckets
    )
    from pyspark.sql import Window as W2

    w = W2.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
