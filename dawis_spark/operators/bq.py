"""Binary quantization ANN: 1-bit sign codes + Hamming candidate
generation + exact re-rank.

The most aggressive member of the quantization family (32x smaller than
float32, 8x smaller than SQ8's codes): keep only the SIGN of each
dimension, packed into 32-bit words; candidate search is Hamming
distance (XOR + popcount — pure integer codegen over 8-byte words), and
the final ordering is repaired by the shared exact-refine stage
(operators/similarity.refine_exact, the FAISS IndexRefineFlat shape).
This is the production "BQ + rescore" recipe (pgvector/Qdrant binary
quantization; Jegou et al.'s sign-of-projection baseline) — it works
because for high-dimensional unit-ish vectors the Hamming distance
between sign patterns is a monotone-enough proxy for angle to build a
candidate pool, and the re-rank makes pool-internal ordering exact.

Packing detail: 32 bits per int64 word, NOT 64 — the top bit of a
64-bit word would make the word negative, and signed-overflow shift
semantics are exactly the kind of engine-specific edge the dual-
rendered oracle discipline avoids. Every word stays in [0, 2^32).

Plan shape: encoding is a map-side expression inside the corpus scan
(codes-only projection — raw vectors never leave the scan in the
candidate stage); the query side (ids + codes + vectors) broadcasts;
Hamming scoring is whole-stage-codegen integer math; only candidate
(query_id, neighbor_id, hamming) triples reach the top-pool window; the
refine stage re-reads (id, vec) for pool members only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def bq_code_expr(vec: str, dim: int, dialect: str) -> str:
    """Array of ``ceil(dim/32)`` int64 words: bit j of word w is set iff
    ``vec[w*32 + j] > 0``. Dual-rendered; out-of-range dims read as 0."""
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    if dialect == "spark":
        word = (
            f"aggregate(sequence(0, {WORD_BITS - 1}), cast(0 as bigint), "
            f"(acc, j) -> acc + if(w * {WORD_BITS} + j < {dim} "
            f"and {vec}[w * {WORD_BITS} + j] > 0, shiftleft(cast(1 as bigint), j), "
            f"cast(0 as bigint)))"
        )
        return f"transform(sequence(0, {n_words - 1}), w -> {word})"
    word = (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(0, {WORD_BITS}), "
        f"j -> CASE WHEN w * {WORD_BITS} + j < {dim} "
        f"AND {vec}[w * {WORD_BITS} + j + 1] > 0 "
        f"THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a, b) -> a + b)"
    )
    return (
        f"list_transform(range(0, {n_words}), w -> {word})"
    )


def bq_hamming_expr(a: str, b: str, dim: int, dialect: str) -> str:
    """Total popcount of XOR over the word arrays (int, 0..dim)."""
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> bit_count(x ^ y)), "
            f"0, (s, v) -> s + v)"
        )
    return (
        f"list_reduce(list_prepend(0, "
        f"list_transform(range(1, {n_words} + 1), "
        f"i -> bit_count(xor({a}[i], {b}[i])))), (s, v) -> s + v)"
    )


def bq_encode(
    corpus: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """(id, codes): packed sign codes, computed inside the scan."""
    return corpus.select(
        F.col(id_col).alias("id"),
        F.expr(bq_code_expr(vec_col, dim, "spark")).alias("codes"),
    )


def bq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    refine_factor: int = 3,
    dim: int = 64,
) -> DataFrame:
    """BQ candidate generation (top ``k*refine_factor`` by Hamming, ties
    id-ascending) + exact cosine re-rank of the pool.

    Output: (query_id, neighbor_id, cosine, rank) — exact scores over
    the BQ-proposed pool, the standard two-stage shape shared with
    ivfpq_refine_topk."""
    from pyspark.sql import Window

    from dawis_spark.operators.similarity import refine_exact

    c_codes = bq_encode(corpus, id_col, vec_col, dim).select(
        F.col("id").alias("neighbor_id"), F.col("codes").alias("c_codes")
    )
    q_codes = bq_encode(queries, id_col, vec_col, dim).select(
        F.col("id").alias("query_id"), F.col("codes").alias("q_codes")
    )
    ham = bq_hamming_expr("q_codes", "c_codes", dim, "spark")
    pool_w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    pool = (
        F.broadcast(q_codes)
        .crossJoin(c_codes)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.expr(ham).alias("hamming"))
        .withColumn("r", F.row_number().over(pool_w))
        .filter(F.col("r") <= k * refine_factor)
        .select("query_id", "neighbor_id")
    )
    return refine_exact(pool, corpus, queries, id_col, vec_col, k)
